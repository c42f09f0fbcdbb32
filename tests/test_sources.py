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
