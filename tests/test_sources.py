from __future__ import annotations

from pmcanalysis_spark.sources.obo import curie_from_iri, parse_obo_text
from pmcanalysis_spark.sources.tsv import (
    phenotype_annotation_scan,
    stitch_alias_scan,
    to_ntriples,
)

OBO = """
format-version: 1.2

[Term]
id: DOID:0001
name: Anemia
synonym: "anemia of inflammation" EXACT []
synonym: "low blood \\"iron\\"" RELATED []
xref: MESH:D000740

[Term]
id: DOID:0002
name: Fibrosis

[Typedef]
id: part_of
name: part of
"""


def test_parse_obo_text():
    rows = parse_obo_text(OBO)
    assert ("anemia", "DOID:0001", "name") in rows
    assert ("anemia of inflammation", "DOID:0001", "synonym") in rows
    assert ("mesh:d000740", "DOID:0001", "xref") in rows
    assert ("fibrosis", "DOID:0002", "name") in rows
    # first-to-last-quote semantics keeps inner escaped quotes
    syns = [r[0] for r in rows if r[2] == "synonym" and "iron" in r[0]]
    assert syns == ['low blood \\"iron\\"']
    # Typedef stanza contributes nothing
    assert not any(r[1] == "part_of" for r in rows)


def test_curie_from_iri():
    assert curie_from_iri("<http://purl.obolibrary.org/obo/DOID_14330>") == "DOID:14330"


def test_stitch_alias_scan(spark, tmp_path):
    p = tmp_path / "aliases.tsv"
    p.write_text(
        "CID123\tAspirin\tChEBI\n"
        "-456\tIbuprofen\tDrugBank\n"
        "CID789\tJunkDrug\tUnknownSource\n"
    )
    rows = {(r.name, r.term_id) for r in stitch_alias_scan(spark, str(p)).collect()}
    assert rows == {("aspirin", "STITCHTM:123"), ("ibuprofen", "STITCHTM:456")}


def test_phenotype_annotation_scan(spark, tmp_path):
    p = tmp_path / "phenotype_annotation.tab"
    p.write_text("OMIM\t101000\t#101000 ACOUSTIC NEUROMA;;neurofibromatosis\tx\n")
    rows = {(r.name, r.term_id) for r in phenotype_annotation_scan(spark, str(p)).collect()}
    assert ("acoustic neuroma", "OMIM:101000") in rows
    assert ("neurofibromatosis", "OMIM:101000") in rows


def test_to_ntriples(spark):
    df = spark.createDataFrame(
        [("http://a/1", "http://p/has", "http://b/2")], "s string, p string, o string"
    )
    line = to_ntriples(df, "s", "p", "o").first()["ntriple"]
    assert line == "<http://a/1> <http://p/has> <http://b/2> ."


OBO_HIER = """
[Term]
id: X:1
name: root

[Term]
id: X:2
name: mid
is_a: X:1 ! root

[Term]
id: X:3
name: leaf
is_a: X:2 ! mid
is_a: X:4 ! other parent

[Term]
id: X:4
name: other
is_a: X:1

[Term]
id: X:9
name: dead
is_a: X:1
is_obsolete: true

[Typedef]
id: part_of
name: part of
"""


def test_parse_obo_is_a():
    from pmcanalysis_spark.sources.obo import parse_obo_is_a

    edges = parse_obo_is_a(OBO_HIER)
    assert ("X:2", "X:1") in edges
    assert ("X:3", "X:2") in edges and ("X:3", "X:4") in edges
    assert ("X:4", "X:1") in edges
    # obsolete stanza contributes no edges
    assert all(c != "X:9" for c, _ in edges)
    assert len(edges) == 4


def test_transitive_closure_diamond():
    from pmcanalysis_spark.sources.obo import parse_obo_is_a, transitive_closure

    clo = set(transitive_closure(parse_obo_is_a(OBO_HIER)))
    # X:3 reaches X:1 through BOTH X:2 and X:4 — once in the closure
    assert clo == {
        ("X:2", "X:1"),
        ("X:3", "X:2"), ("X:3", "X:4"), ("X:3", "X:1"),
        ("X:4", "X:1"),
    }


def test_transitive_closure_cycle_safe():
    from pmcanalysis_spark.sources.obo import transitive_closure

    clo = set(transitive_closure([("a", "b"), ("b", "a"), ("b", "c")]))
    # cycle members see each other + c; no self-loops
    assert ("a", "b") in clo and ("b", "a") in clo
    assert ("a", "c") in clo and ("b", "c") in clo
    assert all(x != y for x, y in clo)


def test_transitive_closure_deep_chain_no_recursion_limit():
    from pmcanalysis_spark.sources.obo import transitive_closure

    n = 5000
    edges = [(f"t{i}", f"t{i+1}") for i in range(n)]
    clo = transitive_closure(edges)
    assert len(clo) == n * (n + 1) // 2


def test_flagship_from_obo_fixture(spark):
    """S6 end-to-end: literal OBO text -> lexicon + closure -> the flagship
    closure-docfreq (a real user's path from an ontology download)."""
    from pmcanalysis_spark.operators.cooccur import close_over_hierarchy
    from pmcanalysis_spark.sources.obo import hierarchy_from_obo, parse_obo_text

    obo = """
[Term]
id: D:1
name: diseaseroot

[Term]
id: D:2
name: flu
is_a: D:1

[Term]
id: D:3
name: cold
synonym: "sniffles" EXACT []
is_a: D:1
"""
    docs = spark.createDataFrame(
        [("d1", "flu season"), ("d2", "a cold day"), ("d3", "sniffles again"),
         ("d4", "nothing here")],
        "doc_id string, text string",
    )
    lex = spark.createDataFrame(
        [(n, t) for n, t, k in parse_obo_text(obo) if k in ("name", "synonym")],
        "name string, term_id string",
    )
    from pyspark.sql import functions as F
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    m = (
        toks.join(lex, toks.tok == lex.name)
        .select("term_id", "doc_id")
        .distinct()
    )
    hier = hierarchy_from_obo(spark, obo)
    closed = close_over_hierarchy(m, hier)
    df = {
        r["term_id"]: r["df"]
        for r in closed.groupBy("term_id")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    # flu:1 doc, cold: d2 + synonym d3 = 2, root inherits union = 3
    assert df == {"D:2": 1, "D:3": 2, "D:1": 3}


def test_to_gaf_golden(spark):
    """GAF row formatting (F13 / MakeDOAFile.groovy:3-10): 17 tab-separated
    fields with job-constant reference/evidence/taxon/date columns."""
    from pmcanalysis_spark.sources.tsv import GAF_HEADER, to_gaf

    df = spark.createDataFrame(
        [("DOID:1", "HP:2", "cancer", 0.5)],
        "subj string, obj string, subj_name string, npmi double",
    )
    [r] = to_gaf(df, score_col="npmi").collect()
    fields = r["gaf_line"].split("\t")
    assert len(fields) == 17
    assert fields[0] == "Aber-OWL"
    assert fields[1] == "DOID:1"
    assert fields[2] == "cancer"
    assert fields[3] == "0.5"
    assert fields[4] == "HP:2"
    assert fields[5] == "http://arxiv.org/abs/1411.0450"
    assert fields[6] == "ITM"
    assert fields[11] == "disease"
    assert fields[12] == "taxon:9606"
    assert GAF_HEADER.startswith("!DB")


def test_obo_closure_equals_fixture_closure(spark):
    """hierarchy_from_obo on the fixture-equivalent OBO file reproduces the
    fixture transitive closure exactly (S6 builder == ELK-flattened shape),
    and the flagship gives identical triples either way."""
    from pmcanalysis_spark.fixtures import (
        build_hierarchy_terms,
        build_lexicon,
        build_web_pages,
        fixture_obo_text,
    )
    from pmcanalysis_spark.pipeline import build_triples
    from pmcanalysis_spark.schemas import HIERARCHY, WEB_PAGES
    from pmcanalysis_spark.sources.obo import hierarchy_from_obo

    text = fixture_obo_text()
    hier_obo = hierarchy_from_obo(spark, text)
    _, closure = build_hierarchy_terms()
    assert {tuple(r) for r in hier_obo.collect()} == set(closure)

    pages = build_web_pages(150)
    lex = [(e.name, e.term_id) for e in build_lexicon()]
    df = spark.createDataFrame(pages, WEB_PAGES)
    hier_fx = spark.createDataFrame(closure, HIERARCHY)
    t_obo = {tuple(r) for r in build_triples(df, lex, hierarchy=hier_obo)
             .select("subj", "pred", "obj", "nab").collect()}
    t_fx = {tuple(r) for r in build_triples(df, lex, hierarchy=hier_fx)
            .select("subj", "pred", "obj", "nab").collect()}
    assert t_obo == t_fx and t_obo


def test_parse_obo_is_a_qualifier_block():
    from pmcanalysis_spark.sources.obo import parse_obo_is_a

    obo = """
[Term]
id: X:1
name: a
is_a: X:2 {implied="true"} ! parent name
is_a: X:3 ! other
"""
    assert parse_obo_is_a(obo) == [("X:1", "X:2"), ("X:1", "X:3")]


MEDLINE_XML = """<MedlineCitationSet>
 <MedlineCitation>
  <PMID>1001</PMID>
  <Article>
   <ArticleTitle>deep parsing of text</ArticleTitle>
   <Abstract><AbstractText>we parse text deeply</AbstractText></Abstract>
   <Affiliation>Univ of X</Affiliation>
   <AuthorList>
    <Author><LastName>smith</LastName><ForeName>a</ForeName></Author>
    <Author><LastName>jones</LastName><ForeName>b</ForeName></Author>
   </AuthorList>
  </Article>
  <MeshHeadingList>
   <MeshHeading><DescriptorName>Parsing</DescriptorName><QualifierName>methods</QualifierName><QualifierName>trends</QualifierName></MeshHeading>
   <MeshHeading><DescriptorName>Text</DescriptorName></MeshHeading>
  </MeshHeadingList>
 </MedlineCitation>
 <MedlineCitation>
  <PMID>1002</PMID>
  <Article>
   <ArticleTitle>more deep parsing</ArticleTitle>
   <Affiliation>Univ of X</Affiliation>
   <AuthorList>
    <Author><LastName>smith</LastName><ForeName>a</ForeName></Author>
    <Author><LastName>jones</LastName><ForeName>b</ForeName></Author>
   </AuthorList>
  </Article>
 </MedlineCitation>
</MedlineCitationSet>"""


OWL_XML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/DOID_0001">
    <rdfs:label>Heart Disease</rdfs:label>
    <oboInOwl:hasExactSynonym>cardiac disease</oboInOwl:hasExactSynonym>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/DOID_0010"/>
    <rdfs:subClassOf><owl:Restriction/></rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/DOID_0010">
    <rdfs:label>disease</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/DOID_0000"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/DOID_0099">
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/DOID_0000"/>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
  </owl:Class>
</rdf:RDF>"""


def test_parse_owl_subclass_of():
    from pmcanalysis_spark.sources.obo import parse_owl_subclass_of

    edges = parse_owl_subclass_of(OWL_XML)
    assert ("DOID:0001", "DOID:0010") in edges
    assert ("DOID:0010", "DOID:0000") in edges
    # deprecated class contributes no edges; anonymous Restriction skipped
    assert all(c != "DOID:0099" for c, _ in edges)
    assert len(edges) == 2


def test_parse_owl_labels():
    from pmcanalysis_spark.sources.obo import parse_owl_labels

    rows = parse_owl_labels(OWL_XML)
    assert ("heart disease", "DOID:0001", "name") in rows
    assert ("cardiac disease", "DOID:0001", "synonym") in rows
    assert all(t != "DOID:0099" for _, t, _ in rows)  # deprecated skipped


def test_owl_closure_equals_obo_twin(spark):
    """The same edge set loaded through OBO is_a and through OWL
    rdfs:subClassOf must close identically — format-agnostic S6."""
    from pmcanalysis_spark.sources.obo import (
        hierarchy_from_obo,
        hierarchy_from_owl,
    )

    obo = "\n".join([
        "[Term]", "id: X:1", "name: a", "is_a: X:10", "",
        "[Term]", "id: X:10", "name: b", "is_a: X:0", "",
        "[Term]", "id: X:2", "name: c", "is_a: X:10", "is_a: X:0", "",
    ])
    owl = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
             xmlns:owl="http://www.w3.org/2002/07/owl#">
      <owl:Class rdf:about="http://purl.obolibrary.org/obo/X_1">
        <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/X_10"/>
      </owl:Class>
      <owl:Class rdf:about="http://purl.obolibrary.org/obo/X_10">
        <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/X_0"/>
      </owl:Class>
      <owl:Class rdf:about="http://purl.obolibrary.org/obo/X_2">
        <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/X_10"/>
        <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/X_0"/>
      </owl:Class>
    </rdf:RDF>"""
    a = sorted(tuple(r) for r in hierarchy_from_obo(spark, obo).collect())
    b = sorted(tuple(r) for r in hierarchy_from_owl(spark, owl).collect())
    assert a == b and ("X:1", "X:0") in a  # transitive edge present


def test_parse_medline_xml_pure():
    from pmcanalysis_spark.sources.xml import parse_medline_xml_text

    rows = parse_medline_xml_text(MEDLINE_XML)
    assert [r["doc_id"] for r in rows] == ["1001", "1002"]
    r = rows[0]
    assert r["title"] == "deep parsing of text"
    assert r["abstract"] == "we parse text deeply"
    assert r["authors"] == ["a\tsmith", "b\tjones"]  # ForeName\tLastName key
    # reference quirk (Author2PMID.groovy:90-95): qualifier text is the
    # GPath concatenation of ALL qualifier nodes, added unconditionally —
    # multi-qualifier headings join ("methodstrends"), qualifier-less
    # headings contribute ""
    assert r["mesh"] == ["Parsing", "methodstrends", "Text", ""]
    assert r["affiliation"] == "Univ of X"
    assert parse_medline_xml_text("<broken") == []


def test_medline_xml_to_author_entities(spark):
    """Raw Medline XML through the full front half: parse -> per-author
    feature records -> similarity clustering (Author2PMID end-to-end)."""
    from pmcanalysis_spark.canonicalize import (
        author_records_from_raw,
        canonicalize_authors,
    )
    from pmcanalysis_spark.sources.xml import medline_articles

    xml_df = spark.createDataFrame([(MEDLINE_XML,)], "xml string")
    arts = medline_articles(xml_df)
    assert arts.count() == 2
    recs = author_records_from_raw(arts)
    ent = {(r["author_key"], r["doc_id"]): r["entity_id"]
           for r in canonicalize_authors(recs).collect()}
    # same coauthor + affiliation + shared title tokens: one smith entity
    assert ent[("a\tsmith", "1001")] == ent[("a\tsmith", "1002")]
