"""Miniature pure-Python oracle — the reference reimplemented in ~100 lines.

Computes expected mentions, closed doc-term sets, pair counts, and scores for
the synthetic fixture corpus, independently of the Spark implementation:
a straight-line O(n^2) scanner (no trie), plain dict/set bookkeeping (like
the reference's Map<String, Set<String>>), and the scalar score functions.

Used by tests/test_pipeline_e2e.py to assert the Spark pipeline's triples
match at P/R = 1.0 on the fixture corpus.
"""

from __future__ import annotations

import math
from collections import defaultdict

from .fixtures import LexiconEntry
from .functions.scores import lgl_py, lmi_py, npmi_py, tscore_py, zscore_py
from .nlp import split_sentences_py, tokenize_py


def _longest_match_scan(
    tokens: list[str], lex: dict[tuple[str, ...], set[str]], max_len: int
) -> list[tuple[int, int, tuple[str, ...]]]:
    """Independent longest-match scanner: try the longest window first at each
    position (O(n * max_len) brute force — deliberately not a trie)."""
    out = []
    i, n = 0, len(tokens)
    while i < n:
        matched = False
        for ln in range(min(max_len, n - i), 0, -1):
            window = tuple(tokens[i : i + ln])
            if window in lex:
                out.append((i, i + ln, window))
                i += ln
                matched = True
                break
        if not matched:
            i += 1
    return out


class MiniOracle:
    def __init__(
        self,
        lexicon: list[LexiconEntry],
        hierarchy: list[tuple[str, str]] | None = None,
        min_name_len: int = 3,
        lang: str | None = "en",
    ):
        self.lex_index: dict[tuple[str, ...], set[str]] = defaultdict(set)
        self.max_len = 1
        for e in lexicon:
            if len(e.name) <= min_name_len:
                continue
            key = tuple(e.name.lower().split())
            self.lex_index[key].add(e.term_id)
            self.max_len = max(self.max_len, len(key))
        self.hierarchy = hierarchy or []
        self.lang = lang

    def mentions_for_text(self, url: str, text: str) -> list[tuple]:
        rows = []
        for si, sent in enumerate(split_sentences_py(text)):
            toks = tokenize_py(sent)
            for b, e, window in _longest_match_scan(toks, self.lex_index, self.max_len):
                for tid in sorted(self.lex_index[window]):
                    rows.append((url, si, tid, " ".join(window), b, e))
        return rows

    def run(self, pages: list[dict]) -> dict:
        """pages: rows from fixtures.build_web_pages(). Returns dict with
        mentions, doc_terms (closed), term_stats, corpus_size, pair rows."""
        mentions = []
        for p in pages:
            if self.lang is not None and p["lang"] != self.lang:
                continue
            mentions.extend(self.mentions_for_text(p["url"], p["text"]))

        dt: set[tuple[str, str]] = {(m[2], m[0]) for m in mentions}
        by_term: dict[str, set[str]] = defaultdict(set)
        for t, d in dt:
            by_term[t].add(d)
        for term_id, anc in self.hierarchy:
            if term_id in by_term:
                by_term[anc] |= by_term[term_id]
        # NB: single pass suffices because hierarchy is the *transitive* closure

        corpus = set()
        for docs in by_term.values():
            corpus |= docs
        total = len(corpus)

        stats = {t: len(d) for t, d in by_term.items()}
        return {
            "mentions": mentions,
            "by_term": by_term,
            "term_stats": stats,
            "corpus_size": total,
        }

    def triples(
        self,
        pages: list[dict],
        a_prefix: str = "DOID:",
        b_prefixes: tuple[str, ...] = ("HP:", "MP:"),
        pred: str = "has-phenotype",
    ) -> list[tuple]:
        st = self.run(pages)
        by_term, stats, total = st["by_term"], st["term_stats"], st["corpus_size"]
        rows = []
        for a, adocs in by_term.items():
            if not a.startswith(a_prefix):
                continue
            for b, bdocs in by_term.items():
                if not any(b.startswith(p) for p in b_prefixes):
                    continue
                nab = len(adocs & bdocs)
                if nab == 0:
                    continue
                na, nb = stats[a], stats[b]
                t, x, y, xy = float(total), float(na), float(nb), float(nab)
                rows.append(
                    (
                        a, pred, b,
                        tscore_py(t, x, y, xy),
                        zscore_py(t, x, y, xy),
                        lmi_py(t, x, y, xy),
                        npmi_py(t, x, y, xy),
                        lgl_py(t, x, y, xy),
                        nab, na, nb,
                    )
                )
        return rows


def trapezoid_auc(points: list[tuple[float, float]]) -> float:
    """Independent AUC for the GetAUC parity test (GetAUC.groovy:8-20)."""
    pts = sorted(points)
    s = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        s += (x1 - x0) * (y0 + y1) / 2.0
    return s


def approx_equal(a: float | None, b: float | None, tol: float = 1e-9) -> bool:
    """NULL (None) and NaN are considered equivalent 'undefined' markers —
    Spark's log() yields NULL where java.lang.Math yields NaN."""
    a_undef = a is None or (isinstance(a, float) and math.isnan(a))
    b_undef = b is None or (isinstance(b, float) and math.isnan(b))
    if a_undef or b_undef:
        return a_undef and b_undef
    if math.isinf(a) or math.isinf(b):
        return a == b
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
