"""Snapshot-table semantics: atomic commits, append file-sharing, time
travel, rollback, optimistic-concurrency conflicts, expiry."""

from __future__ import annotations

import json
import os

import pytest

from pmcanalysis_spark.snapshots import CommitConflict, SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 as v")


def test_append_overwrite_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    v1 = t.commit(_df(spark, 0, 5), mode="append")
    v2 = t.commit(_df(spark, 5, 8), mode="append")
    v3 = t.commit(_df(spark, 100, 102), mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert t.current_version() == 3
    # time travel reads every retained snapshot
    assert sorted(r.id for r in t.read(1).collect()) == list(range(5))
    assert sorted(r.id for r in t.read(2).collect()) == list(range(8))
    assert sorted(r.id for r in t.read().collect()) == [100, 101]
    # appends share the parent's files: snapshot 2 references both commits
    assert len(t.snapshot(2)["files"]) == 2
    assert t.snapshot(2)["row_count"] == 8


def test_crashed_commit_invisible(spark, tmp_path):
    """Data files written but no snapshot json (a crash before the commit
    point): readers still see the previous snapshot only."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3))
    # simulate the orphaned half-commit
    _df(spark, 50, 60).write.parquet(str(tmp_path / "t" / "data" / "orphan"))
    assert t.current_version() == 1
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2]


def test_commit_conflict_raises_and_cleans(spark, tmp_path):
    """Two writers racing from the same parent: the second create of the
    same snapshot version fails with CommitConflict and its data files are
    removed (retry would re-read the new current and commit as v3)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3))
    # writer A wins version 2 out-of-band
    snap_path = str(tmp_path / "t" / "snapshots" / "v000002.json")
    with open(snap_path, "w") as f:
        json.dump({"snapshot_id": 2, "parent": 1, "operation": "append",
                   "files": t.snapshot(1)["files"], "row_count": 3}, f)
    before = set(os.listdir(tmp_path / "t" / "data"))
    with pytest.raises(CommitConflict):
        t.commit(_df(spark, 3, 6))
    after = set(os.listdir(tmp_path / "t" / "data"))
    assert before == after  # loser's files cleaned up


def test_rollback_preserves_history(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 4))
    t.commit(_df(spark, 100, 101), mode="overwrite")
    v3 = t.rollback(1)
    assert v3 == 3 and t.current_version() == 3
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3]
    # the overwritten snapshot is still readable (history not rewritten)
    assert [r.id for r in t.read(2).collect()] == [100]


def test_expire_snapshots(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3))
    t.commit(_df(spark, 100, 102), mode="overwrite")
    t.commit(_df(spark, 200, 201), mode="overwrite")
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    # current still reads; expired snapshot gone, its orphan data deleted
    assert [r.id for r in t.read().collect()] == [200]
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)
    remaining = set(os.listdir(tmp_path / "t" / "data"))
    assert remaining == set(t.snapshot(3)["files"])


def test_commit_retry_after_conflict(spark, tmp_path):
    """The documented retry protocol: after CommitConflict, re-invoking
    commit re-reads the new current version and lands as the next snapshot
    with the winner's rows included (append semantics preserved)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3))
    # writer A wins version 2 out-of-band (same files, fake append)
    with open(str(tmp_path / "t" / "snapshots" / "v000002.json"), "w") as f:
        json.dump({"snapshot_id": 2, "parent": 1, "operation": "append",
                   "files": t.snapshot(1)["files"], "row_count": 3}, f)
    with open(str(tmp_path / "t" / "_current.json"), "w") as f:
        json.dump({"current": 2}, f)
    with_retry = None
    for _ in range(2):  # the retry loop a caller writes
        try:
            with_retry = t.commit(_df(spark, 10, 12), mode="append")
            break
        except CommitConflict:
            continue
    assert with_retry == 3
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 10, 11]
