"""HTML → text extraction with a byte-identical-per-url contract.

Reference behavior (/root/reference/ParsePMC.groovy:243):
``Jsoup.parse(file.getText().replaceAll(">", "> ")).text().toLowerCase()``
— i.e. whitespace-joined visible tag text, lowercased.

Our contract (per BASELINE.json input_hint / FIXTURES.md §1): boilerplate-
stripped body text — the whitespace-collapsed text of ``<p>`` elements in
document order, joined by single spaces, lowercased. Boilerplate containers
(``script, style, nav, footer, header, head, title``) contribute nothing.

The parser is pure Python (stdlib ``html.parser``) so the bytes are frozen —
no version-floating HTML library behavior. The Spark-side wrapper is an
Arrow-batched pandas UDF (no per-row Python round trips).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_BOILERPLATE = {"script", "style", "nav", "footer", "header", "head", "title"}
_CONTENT = {"p"}


class _Extractor(HTMLParser):
    """Collects whitespace-collapsed text of <p> elements outside boilerplate."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._p_depth = 0
        self._chunks: list[str] = []
        self._current: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BOILERPLATE:
            self._skip_depth += 1
        elif tag in _CONTENT and self._skip_depth == 0:
            self._p_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _BOILERPLATE:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _CONTENT and self._p_depth > 0:
            self._p_depth -= 1
            if self._p_depth == 0 and self._current:
                chunk = " ".join("".join(self._current).split())
                if chunk:
                    self._chunks.append(chunk)
                self._current = []

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and self._p_depth > 0:
            self._current.append(data)

    def result(self) -> str:
        if self._current:  # unterminated final <p>
            chunk = " ".join("".join(self._current).split())
            if chunk:
                self._chunks.append(chunk)
            self._current = []
        return " ".join(self._chunks).lower()


def extract_text_py(html: bytes | str | None) -> str:
    """Pure-Python extraction — the frozen, golden-testable function."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return p.result()


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper; one Python→JVM crossing per batch, not per row."""
    return html.map(extract_text_py)
