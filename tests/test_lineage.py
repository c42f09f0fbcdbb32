from __future__ import annotations

import json
import os

from pmcanalysis_spark.lineage import materialize_stage, read_lineage


def test_materialize_writes_lineage_and_resumes(spark, tmp_path):
    base = str(tmp_path / "stages")
    df = spark.range(1000).selectExpr("id", "id % 7 as k")

    out, res = materialize_stage(df, "stage_a", base, key_col="id")
    assert not res.resumed
    assert res.row_count == 1000
    assert out.count() == 1000

    lin = read_lineage(spark, base, "stage_a")
    rows = lin.collect()
    assert sum(r.row_count for r in rows) == 1000
    assert {r.stage for r in rows} == {"stage_a"}
    assert all(r.run_id == res.run_id for r in rows)
    # min/max key per partition recorded
    assert all(r.min_key is not None and r.max_key is not None for r in rows)

    # same input -> resume (no rewrite, same data)
    out2, res2 = materialize_stage(df, "stage_a", base, key_col="id")
    assert res2.resumed
    assert res2.run_id == res.run_id
    assert out2.count() == 1000


def test_changed_input_invalidates_snapshot(spark, tmp_path):
    base = str(tmp_path / "stages")
    df1 = spark.range(100).selectExpr("id")
    _, r1 = materialize_stage(df1, "s", base, key_col="id")
    df2 = spark.range(200).selectExpr("id")
    out2, r2 = materialize_stage(df2, "s", base, key_col="id")
    assert not r2.resumed
    assert out2.count() == 200


def test_uncommitted_snapshot_is_rebuilt(spark, tmp_path):
    base = str(tmp_path / "stages")
    df = spark.range(50).selectExpr("id")
    _, r1 = materialize_stage(df, "s", base, key_col="id")
    # corrupt: mark uncommitted (simulates a crash before manifest rename)
    mpath = os.path.join(base, "s", "_lineage_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["committed"] = False
    with open(mpath, "w") as f:
        json.dump(m, f)
    out, r2 = materialize_stage(df, "s", base, key_col="id")
    assert not r2.resumed
    assert out.count() == 50
