"""Co-located (bucketed) self-join: the J4 pair join over a bucketed
doc_terms table must plan with ZERO exchanges — the at-rest partitioning
satisfies the join's distribution requirement."""

from __future__ import annotations

import pytest

from pmcanalysis_spark.operators.cooccur import (
    materialize_bucketed_doc_terms,
    pair_counts,
)


@pytest.fixture()
def bucketed(spark, tmp_path):
    # default in-memory catalog + ./spark-warehouse (warehouse dir is a
    # static conf; the managed table is dropped on teardown)
    dt = spark.createDataFrame(
        [(f"DOID:{i % 5}", f"d{j}") for i in range(5) for j in range(i, 200, i + 1)]
        + [(f"HP:{i % 4}", f"d{j}") for i in range(4) for j in range(i, 200, i + 2)],
        "term_id string, doc_id string",
    ).distinct()
    yield dt, materialize_bucketed_doc_terms(dt, "dt_bucketed_test", buckets=8)
    spark.sql("DROP TABLE IF EXISTS dt_bucketed_test")


def test_bucketed_self_join_is_exchange_free(spark, bucketed):
    _, tbl = bucketed
    pairs = pair_counts(tbl, "DOID:", "HP:")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle; the only exchange allowed is the
    # final (a_id, b_id) aggregation
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(doc_id" not in plan, plan


def test_bucketed_join_results_match_unbucketed(spark, bucketed):
    dt, tbl = bucketed
    expected = {
        (r.a_id, r.b_id): r.nab for r in pair_counts(dt, "DOID:", "HP:").collect()
    }
    got = {
        (r.a_id, r.b_id): r.nab for r in pair_counts(tbl, "DOID:", "HP:").collect()
    }
    assert got == expected and got
