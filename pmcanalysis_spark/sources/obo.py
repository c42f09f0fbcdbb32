"""OBO ontology lexicon + hierarchy source (SURVEY.md S5/S6).

Line-oriented parse of ``id:``/``name:``/``synonym:``/``xref:`` stanzas into
(name, term_id, kind) rows — the semantics of the reference's
``parseOntologies`` closure (/root/reference/FindDiseasePhenotypes2.groovy:
79-111): synonym text is the substring between the FIRST and LAST double
quote (F10), names are lowercased (the NER scripts' convention,
ParseMedline2.groovy:89,96,104), a name maps to a *set* of ids.

S6 production side: ``is_a:`` stanza lines are the subclass axioms; the
flattened transitive closure (what the reference gets from ELK's
``getSubClasses(...).getFlattened()``, FindDiseasePhenotypes2.groovy:112-139
/ ``getSuperClasses`` at ParseMedline.groovy:151-161) is computed here with
a driver-side BFS and handed to ``close_over_hierarchy`` /
``detect_doc_terms`` as the broadcast ``hierarchy(term_id, ancestor_id)``
dimension. The closure is STRICT (a term is not its own ancestor) and
skips ``is_obsolete: true`` stanzas.

Ontology files are small (≤ tens of MB, ~1e5-1e6 edges) so this parses and
closes on the driver and returns rows for a broadcast dimension — no
distributed scan needed. (At 100 TB the *corpus* scales; ontologies don't.)
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


def parse_obo_is_a(text: str) -> list[tuple[str, str]]:
    """OBO text -> direct subclass edges [(child_id, parent_id)].

    Parses ``is_a: PARENT ! optional name`` lines inside [Term] stanzas;
    stanzas marked ``is_obsolete: true`` contribute no edges (obsolete terms
    keep an is_a trail in some ontologies but ELK never classifies them).
    Duplicate edges dedup; order is first-seen (deterministic).
    """
    edges: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    current_id: str | None = None
    in_term = False
    pending: list[str] = []  # parents seen before knowing obsolete status

    def flush():
        nonlocal pending
        if current_id is not None:
            for p in pending:
                e = (current_id, p)
                if e not in seen:
                    seen.add(e)
                    edges.append(e)
        pending = []

    obsolete = False
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("[") and line.endswith("]"):
            if not obsolete:
                flush()
            pending = []
            in_term = line == "[Term]"
            current_id = None
            obsolete = False
        elif not in_term:
            continue
        elif line.startswith("id:"):
            current_id = line[3:].strip()
        elif line.startswith("is_a:"):
            # strip the optional trailing comment (! name) and qualifier
            # block ({implied="true"}) of the OBO 1.4 syntax
            target = line[5:].split("!", 1)[0].split("{", 1)[0].strip()
            if target:
                pending.append(target)
        elif line.startswith("is_obsolete:") and line[12:].strip() == "true":
            obsolete = True
    if not obsolete:
        flush()
    return edges


def transitive_closure(edges: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Direct edges [(child, parent)] -> strict transitive closure
    [(term_id, ancestor_id)], the flattened-superclass set per term (the
    shape ELK returns, ref ParseMedline.groovy:151-161).

    Cycle-correct via SCC condensation (iterative Tarjan, so neither deep
    chains nor cycles hit the recursion limit): members of a cycle are
    mutual ancestors (minus self), plus everything reachable from the
    cycle. Ontologies are DAGs in practice, but a malformed is_a loop must
    not silently drop ancestors (property-tested against an independent
    fixpoint reference in tests/test_properties.py). Output sorted for
    determinism.
    """
    parents: dict[str, list[str]] = {}
    nodes: list[str] = []
    seen_nodes: set[str] = set()
    for c, p in edges:
        parents.setdefault(c, []).append(p)
        for x in (c, p):
            if x not in seen_nodes:
                seen_nodes.add(x)
                nodes.append(x)

    # iterative Tarjan over the child->parent graph: SCCs complete only
    # after everything reachable from them, so comp-closure unions resolve
    # in emission order
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stck: list[str] = []
    comp_of: dict[str, int] = {}
    comp_members: list[list[str]] = []
    counter = 0

    for root in nodes:
        if root in index:
            continue
        work: list[tuple[str, int]] = [(root, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter
                counter += 1
                stck.append(node)
                on_stack.add(node)
            advanced = False
            ps = parents.get(node, ())
            while pi < len(ps):
                p = ps[pi]
                pi += 1
                if p not in index:
                    work[-1] = (node, pi)
                    work.append((p, 0))
                    advanced = True
                    break
                if p in on_stack:
                    low[node] = min(low[node], index[p])
            if advanced:
                continue
            work.pop()
            if low[node] == index[node]:
                cid = len(comp_members)
                members: list[str] = []
                while True:
                    w = stck.pop()
                    on_stack.discard(w)
                    comp_of[w] = cid
                    members.append(w)
                    if w == node:
                        break
                comp_members.append(members)
            if work:
                parent_node = work[-1][0]
                low[parent_node] = min(low[parent_node], low[node])

    # comp emission order == reverse topological wrt child->parent edges:
    # by the time a comp is emitted, every comp it points to is done
    comp_closure: list[set[str]] = []
    for cid, members in enumerate(comp_members):
        s: set[str] = set()
        for m in members:
            for p in parents.get(m, ()):
                pc = comp_of[p]
                if pc != cid:
                    # reaching any member of the parent comp reaches them all
                    s.update(comp_members[pc])
                    s |= comp_closure[pc]
        comp_closure.append(s)

    out: list[tuple[str, str]] = []
    for term in sorted(parents):
        cid = comp_of[term]
        anc = set(comp_members[cid]) - {term} | comp_closure[cid]
        for a in sorted(anc):
            out.append((term, a))
    return out


def hierarchy_from_obo(spark, text: str | None = None, path: str | None = None):
    """OBO source -> hierarchy(term_id, ancestor_id) DataFrame: the
    production side of S6. Feed the result to
    ``pipeline.build_kg``/``close_over_hierarchy`` as the closure dim."""
    if text is None:
        with open(path, encoding="utf-8") as f:  # type: ignore[arg-type]
            text = f.read()
    closure = transitive_closure(parse_obo_is_a(text))
    if not closure:
        return spark.createDataFrame([], "term_id string, ancestor_id string")
    return spark.createDataFrame(closure, "term_id string, ancestor_id string")


def curie_from_iri(iri: str) -> str:
    """IRI -> CURIE rewrite (F9): <http://purl.obolibrary.org/obo/X_Y> -> X:Y
    (FindDiseasePhenotypes2.groovy:130,136). Accepts both the angle-bracket
    N-Triples form and the bare RDF/XML attribute form."""
    return (
        iri.replace("<http://purl.obolibrary.org/obo/", "")
        .replace("http://purl.obolibrary.org/obo/", "")
        .replace(">", "")
        .replace("_", ":")
    )


# --- OWL (RDF/XML) source: the format the reference actually loads --------
#
# The reference feeds DOID/HP ``.owl`` files through the ELK reasoner and
# flattens ``reasoner.getSubClasses(...)`` (FindDiseasePhenotypes2.groovy:
# 112-139). For asserted ``rdfs:subClassOf`` hierarchies (what the README
# workflow's ontologies are, modulo the reasoner's trivial inferences) the
# same flattened closure is the transitive closure of the asserted edges —
# parsed here with stdlib ElementTree, no OWL API needed. Anonymous
# superclasses (owl:Restriction blank nodes) carry no rdf:resource and are
# skipped — ELK's getSubClasses flattening likewise only returns NAMED
# classes. Deprecated classes (owl:deprecated true) contribute no edges,
# mirroring parse_obo_is_a's is_obsolete handling.

_RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
_RDFS = "{http://www.w3.org/2000/01/rdf-schema#}"
_OWL = "{http://www.w3.org/2002/07/owl#}"
_OBOINOWL = "{http://www.geneontology.org/formats/oboInOwl#}"


def _owl_classes(text: str):
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    for cls in root.iter(f"{_OWL}Class"):
        about = cls.get(f"{_RDF}about")
        if not about:
            continue  # blank-node class (e.g. inside a Restriction)
        dep = cls.find(f"{_OWL}deprecated")
        if dep is not None and (dep.text or "").strip() == "true":
            continue
        yield curie_from_iri(about), cls


def parse_owl_subclass_of(text: str) -> list[tuple[str, str]]:
    """OWL RDF/XML -> direct subclass edges [(child_curie, parent_curie)].

    Feed the result to ``transitive_closure`` for the flattened hierarchy
    (the S6 twin of ``parse_obo_is_a`` for users holding the actual ``.owl``
    downloads of the README workflow). Duplicate edges dedup, first-seen
    order (deterministic, same contract as parse_obo_is_a)."""
    edges: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    for child, cls in _owl_classes(text):
        for sup in cls.findall(f"{_RDFS}subClassOf"):
            res = sup.get(f"{_RDF}resource")
            if not res:  # anonymous superclass (Restriction) — named only
                continue
            e = (child, curie_from_iri(res))
            if e not in seen:
                seen.add(e)
                edges.append(e)
    return edges


def parse_owl_labels(text: str) -> list[tuple[str, str, str]]:
    """OWL RDF/XML -> [(name, term_id, kind)] with kind name|synonym —
    rdfs:label and oboInOwl:hasExactSynonym, lowercased (the same lexicon
    shape parse_obo_text emits, so the NER path is format-agnostic)."""
    rows: list[tuple[str, str, str]] = []
    for curie, cls in _owl_classes(text):
        for lab in cls.findall(f"{_RDFS}label"):
            if lab.text:
                rows.append((lab.text.strip().lower(), curie, "name"))
        for syn in cls.findall(f"{_OBOINOWL}hasExactSynonym"):
            if syn.text:
                rows.append((syn.text.strip().lower(), curie, "synonym"))
    return rows


def hierarchy_from_owl(spark, text: str | None = None, path: str | None = None):
    """OWL source -> hierarchy(term_id, ancestor_id) DataFrame — the
    ``.owl``-format twin of ``hierarchy_from_obo`` (ref
    FindDiseasePhenotypes2.groovy:112-139)."""
    if text is None:
        with open(path, encoding="utf-8") as f:  # type: ignore[arg-type]
            text = f.read()
    closure = transitive_closure(parse_owl_subclass_of(text))
    if not closure:
        return spark.createDataFrame([], "term_id string, ancestor_id string")
    return spark.createDataFrame(closure, "term_id string, ancestor_id string")
