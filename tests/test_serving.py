"""Point-lookup serving path (reference DermoServlet semantics: OWL
expansion -> boolean doc query -> ranked top-N)."""

from __future__ import annotations

from pmcanalysis_spark.serving import KGIndex, build_serving_tables


def _snapshot(spark, tmp_path):
    doc_terms = spark.createDataFrame(
        [
            ("T:LEAF1", "d1"), ("T:LEAF1", "d2"),
            ("T:LEAF2", "d3"),
            ("T:OTHER", "d2"), ("T:OTHER", "d4"),
        ],
        "term_id string, doc_id string",
    )
    lexicon = spark.createDataFrame(
        [("alpha one", "T:LEAF1"), ("alpha two", "T:LEAF2"),
         ("beta", "T:OTHER"), ("Alpha Root", "T:ROOT")],
        "name string, term_id string",
    )
    hierarchy = spark.createDataFrame(
        [("T:LEAF1", "T:ROOT"), ("T:LEAF2", "T:ROOT")],
        "term_id string, ancestor_id string",
    )
    paths = build_serving_tables(doc_terms, lexicon, hierarchy, str(tmp_path))
    return KGIndex(spark, paths)


def test_expand_includes_subclasses(spark, tmp_path):
    idx = _snapshot(spark, tmp_path)
    assert sorted(idx.expand("T:ROOT")) == ["T:LEAF1", "T:LEAF2", "T:ROOT"]
    assert idx.expand("T:LEAF1") == ["T:LEAF1"]


def test_lookup_or_with_expansion_ranked(spark, tmp_path):
    idx = _snapshot(spark, tmp_path)
    # ROOT expands to both leaves: docs d1, d2 (LEAF1) and d3 (LEAF2)
    got = [(r["doc_id"], r["n_matched"]) for r in idx.lookup(["T:ROOT"]).collect()]
    assert got == [("d1", 1), ("d2", 1), ("d3", 1)]


def test_lookup_and_requires_all_query_terms(spark, tmp_path):
    idx = _snapshot(spark, tmp_path)
    # ROOT-expansion AND T:OTHER: only d2 carries both
    got = [r["doc_id"] for r in idx.lookup(["T:ROOT", "T:OTHER"], mode="and").collect()]
    assert got == ["d2"]
    # OR of the same terms: every tagged doc
    got_or = [r["doc_id"] for r in idx.lookup(["T:ROOT", "T:OTHER"], mode="or").collect()]
    assert got_or == ["d2", "d1", "d3", "d4"] or set(got_or) == {"d1", "d2", "d3", "d4"}


def test_resolve_and_autocomplete(spark, tmp_path):
    idx = _snapshot(spark, tmp_path)
    assert idx.resolve("ALPHA ONE") == ["T:LEAF1"]
    assert idx.autocomplete("alpha") == ["Alpha Root", "alpha one", "alpha two"]


def test_lookup_limit(spark, tmp_path):
    idx = _snapshot(spark, tmp_path)
    assert idx.lookup(["T:ROOT"], limit=2).count() == 2


def test_snapshot_resumes(spark, tmp_path):
    """Rebuilding the serving tables with identical inputs resumes from the
    committed snapshots instead of rewriting."""
    import json

    _snapshot(spark, tmp_path)
    with open(tmp_path / "serving_inverted" / "_lineage_manifest.json") as f:
        run1 = json.load(f)["run_id"]
    _snapshot(spark, tmp_path)
    with open(tmp_path / "serving_inverted" / "_lineage_manifest.json") as f:
        run2 = json.load(f)["run_id"]
    assert run1 == run2


def test_highlight_snippets_window_and_tags(spark):
    """Snippet fragments: +-width chars around the FIRST occurrence, match
    tag-wrapped, window clipped at both text edges (the DataFrame half of
    DermoServlet.groovy:443-502's Lucene highlighter)."""
    from pmcanalysis_spark.serving import highlight_snippets

    docs = spark.createDataFrame(
        [
            ("d1", "aa bb spark cc dd"),
            ("d2", "spark starts here with text running past the edge"),
            ("d3", "ends with the word spark"),
            ("d4", "no match in this one"),
        ],
        "doc_id string, text string",
    )
    lex = spark.createDataFrame(
        [("spark", "OP:1"), ("absent", "OP:2")], "name string, term_id string"
    )
    got = {r["doc_id"]: r for r in highlight_snippets(docs, lex, width=6).collect()}
    assert set(got) == {"d1", "d2", "d3"}
    assert all(r["term_id"] == "OP:1" for r in got.values())
    assert got["d1"]["snippet"] == "aa bb <b>spark</b> cc dd"
    assert got["d2"]["snippet"] == "<b>spark</b> start"   # left edge clipped
    assert got["d3"]["snippet"] == " word <b>spark</b>"   # right edge clipped


def test_highlight_snippets_no_shuffle_plan(spark):
    """Plan contract: broadcast join + string algebra only — no Exchange."""
    from pmcanalysis_spark.serving import highlight_snippets

    docs = spark.createDataFrame(
        [("d1", "x spark y")], "doc_id string, text string")
    lex = spark.createDataFrame([("spark", "OP:1")], "name string, term_id string")
    plan = highlight_snippets(docs, lex)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
