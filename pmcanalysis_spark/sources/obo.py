"""OBO ontology lexicon source (SURVEY.md S5).

Line-oriented parse of ``id:``/``name:``/``synonym:``/``xref:`` stanzas into
(name, term_id, kind) rows — the semantics of the reference's
``parseOntologies`` closure (/root/reference/FindDiseasePhenotypes2.groovy:
79-111): synonym text is the substring between the FIRST and LAST double
quote (F10), names are lowercased (the NER scripts' convention,
ParseMedline2.groovy:89,96,104), a name maps to a *set* of ids.

Ontology files are small (≤ tens of MB) so this parses on the driver and
returns rows for a broadcast dimension — no distributed scan needed.
"""

from __future__ import annotations

import re

_SYN_RE = re.compile(r'"(.*)"')  # first-to-last quote, greedy (F10)


def parse_obo_text(text: str) -> list[tuple[str, str, str]]:
    """OBO text -> [(name, term_id, kind)]; kind in name|synonym|xref."""
    rows: list[tuple[str, str, str]] = []
    current_id: str | None = None
    in_term = False
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("[") and line.endswith("]"):
            in_term = line == "[Term]"
            current_id = None
        elif not in_term:
            continue
        elif line.startswith("id:"):
            current_id = line[3:].strip()
        elif line.startswith("name:") and current_id:
            rows.append((line[5:].strip().lower(), current_id, "name"))
        elif line.startswith("synonym:") and current_id:
            m = _SYN_RE.search(line)
            if m:
                rows.append((m.group(1).lower(), current_id, "synonym"))
        elif line.startswith("xref:") and current_id:
            rows.append((line[5:].strip().lower(), current_id, "xref"))
    return rows


def parse_obo_file(path: str) -> list[tuple[str, str, str]]:
    with open(path, encoding="utf-8") as f:
        return parse_obo_text(f.read())


def curie_from_iri(iri: str) -> str:
    """IRI -> CURIE rewrite (F9): <http://purl.obolibrary.org/obo/X_Y> -> X:Y
    (FindDiseasePhenotypes2.groovy:130,136)."""
    return (
        iri.replace("<http://purl.obolibrary.org/obo/", "")
        .replace(">", "")
        .replace("_", ":")
    )
