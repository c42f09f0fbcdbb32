from __future__ import annotations

from pmcanalysis_spark.canonicalize import canonicalize_terms, rewrite_triples_canonical


def test_canonicalize_terms_merges_shared_names(spark):
    lex = spark.createDataFrame(
        [
            ("tremor", "HP:2", "name"),
            ("tremor", "MP:2", "name"),       # shares name with HP:2
            ("mesh:x1", "MP:2", "xref"),
            ("mesh:x1", "DOID:9", "xref"),    # shares xref with MP:2
            ("anemia", "DOID:1", "name"),     # singleton
        ],
        "name string, term_id string, kind string",
    )
    canon = {r.term_id: r.canonical_id for r in canonicalize_terms(lex).collect()}
    # HP:2 -- MP:2 -- DOID:9 one entity; min id canonical
    assert canon["HP:2"] == canon["MP:2"] == canon["DOID:9"] == "DOID:9"
    assert canon["DOID:1"] == "DOID:1"


def test_rewrite_triples_canonical_reaggregates(spark):
    triples = spark.createDataFrame(
        [
            ("HP:2", "p", "DOID:1", 3, 10, 5, 0.5),
            ("MP:2", "p", "DOID:1", 4, 8, 5, 0.7),
        ],
        "subj string, pred string, obj string, nab long, na long, nb long, npmi double",
    )
    canon = spark.createDataFrame(
        [("HP:2", "DOID:9"), ("MP:2", "DOID:9")], "term_id string, canonical_id string"
    )
    out = rewrite_triples_canonical(triples, canon).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.obj) == ("DOID:9", "DOID:1")
    assert r.nab == 7 and r.npmi == 0.7
