"""Connected-components canonicalization recovers the planted author
entities (FIXTURES.md §5) and is permutation-invariant — the property the
reference's greedy clustering (Author2PMID.groovy:126-159) lacks."""

from __future__ import annotations

from pmcanalysis_spark.canonicalize import canonicalize_authors, connected_components
from pmcanalysis_spark.fixtures import build_author_records
from pmcanalysis_spark.schemas import AUTHOR_RECORDS


def _clusters(rows):
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r["entity_id"], set()).add(r["doc_id"])
    return {frozenset(v) for v in by_entity.values()}


def test_recovers_true_entities(spark):
    recs = build_author_records()
    df = spark.createDataFrame(recs, AUTHOR_RECORDS)
    got = _clusters([r.asDict() for r in canonicalize_authors(df).collect()])
    expected = {}
    for r in recs:
        expected.setdefault(r["true_entity"], set()).add(r["doc_id"])
    assert got == {frozenset(v) for v in expected.values()}


def test_permutation_invariance(spark):
    recs = build_author_records()
    df1 = spark.createDataFrame(recs, AUTHOR_RECORDS)
    df2 = spark.createDataFrame(list(reversed(recs)), AUTHOR_RECORDS)
    c1 = _clusters([r.asDict() for r in canonicalize_authors(df1).collect()])
    c2 = _clusters([r.asDict() for r in canonicalize_authors(df2).collect()])
    assert c1 == c2


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"]
    assert comp["x"] == comp["y"]
    assert comp["a"] != comp["x"]


def test_connected_components_distributed_path_matches_fast_path(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("p", "q"), ("q", "r")],
        "src string, dst string",
    )
    verts = spark.createDataFrame([(v,) for v in "abcdxypqrz"], "id string")
    fast = {
        r.id: r.component
        for r in connected_components(edges, vertices=verts).collect()
    }
    dist = {
        r.id: r.component
        for r in connected_components(
            edges, vertices=verts, driver_threshold=0
        ).collect()
    }
    assert fast == dist
    assert fast["z"] == "z"  # isolated vertex labels itself
