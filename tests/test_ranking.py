from __future__ import annotations

import math

from pmcanalysis_spark.fixtures import RATES_EXPECTED_AUC, build_rates
from pmcanalysis_spark.operators.ranking import (
    normalized_rank,
    rank_cutoff_sweep,
    topk_per_key,
    trapezoid_auc,
)
from pmcanalysis_spark.oracle import trapezoid_auc as auc_py


def _pairs_df(spark):
    rows = [
        ("d1", "p1", 0.9), ("d1", "p2", 0.8), ("d1", "p3", 0.7), ("d1", "p4", 0.6),
        ("d2", "p1", 0.5), ("d2", "p2", 0.4),
    ]
    return spark.createDataFrame(rows, "doid string, pid string, npmi double")


def test_topk_per_key(spark):
    out = topk_per_key(_pairs_df(spark), "doid", "npmi", 2, tiebreak="pid").collect()
    got = {(r.doid, r.pid) for r in out}
    assert got == {("d1", "p1"), ("d1", "p2"), ("d2", "p1"), ("d2", "p2")}


def test_topk_tiebreak_is_deterministic(spark):
    rows = [("d", f"p{i}", 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "doid string, pid string, npmi double")
    out = topk_per_key(df, "doid", "npmi", 2, tiebreak="pid").collect()
    assert sorted(r.pid for r in out) == ["p0", "p1"]


def test_normalized_rank(spark):
    # d1 has 4 rows: ranks 0,1,2,3 -> nrank 0, .25, .5, .75; cutoff .5 keeps 2
    out = normalized_rank(_pairs_df(spark), "doid", "npmi", 0.5, tiebreak="pid").collect()
    d1 = [r.pid for r in out if r.doid == "d1"]
    assert sorted(d1) == ["p1", "p2"]


def test_trapezoid_auc_matches_fixture(spark):
    df = spark.createDataFrame(build_rates())
    got = trapezoid_auc(df).first()["auc"]
    assert math.isclose(got, RATES_EXPECTED_AUC)
    assert math.isclose(auc_py([(r["x"], r["y"]) for r in build_rates()]), RATES_EXPECTED_AUC)


def test_rank_cutoff_sweep_one_pass(spark):
    out = rank_cutoff_sweep(_pairs_df(spark), "doid", "npmi", max_cutoff=3).collect()
    # cutoff=1 keeps rank 1 only; cutoff=3 keeps ranks 1..3
    by_cutoff = {}
    for r in out:
        by_cutoff.setdefault(r.cutoff, set()).add((r.doid, r.pid))
    assert by_cutoff[1] == {("d1", "p1"), ("d2", "p1")}
    assert ("d1", "p3") in by_cutoff[3] and ("d1", "p4") not in by_cutoff[3]
