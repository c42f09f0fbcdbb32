"""Event-time analytics: sessionization, as-of join, binned range join,
multi-grain rollup."""

from __future__ import annotations

import datetime as dt

from pmcanalysis_spark.operators.events import (
    asof_join_prior,
    range_join_binned,
    rollup_multigrain,
    sessionize,
)


def _ev(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions (40-min gap between e2 and e3)
        (1, t0, 1, "view", 1.0),
        (2, t0 + dt.timedelta(minutes=10), 1, "buy", 2.0),
        (3, t0 + dt.timedelta(minutes=50), 1, "view", 3.0),
        # user 2: one session, no buys
        (4, t0 + dt.timedelta(minutes=5), 2, "view", 4.0),
        (5, t0 + dt.timedelta(minutes=6), 2, "view", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_gap(spark):
    out = {r.event_id: (r.session_seq, r.session_id)
           for r in sessionize(_ev(spark), gap_seconds=1800).collect()}
    assert out[1] == (1, "1#1") and out[2] == (1, "1#1")
    assert out[3] == (2, "1#2")          # 40-min gap starts session 2
    assert out[4] == (1, "2#1") and out[5] == (1, "2#1")


def test_asof_join_prior(spark):
    out = {r.event_id: (r.asof_event_id, r.asof_value)
           for r in asof_join_prior(_ev(spark), match_type="buy").collect()}
    assert out[1] == (None, None)        # nothing prior
    assert out[2] == (None, None)        # the buy itself sees only PRIOR
    assert out[3] == (2, 2.0)            # latest prior buy
    assert out[4] == (None, None) and out[5] == (None, None)


def test_range_join_binned_equals_theta(spark):
    """Binned equi-join result == the naive theta join, each pair exactly
    once, across bin-straddling intervals and negative coordinates."""
    pts = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate([-15, -10, -1, 0, 3, 9, 10, 25, 99])],
        "pid long, x double",
    )
    ivs = spark.createDataFrame(
        [(100, -12.0, 4.0), (101, 0.0, 10.0), (102, 8.0, 30.0), (103, 50.0, 60.0)],
        "iid long, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join_binned(pts, ivs, bin_width=7.0).collect()
    )
    exp = sorted(
        (r.pid, r.iid)
        for r in pts.crossJoin(ivs)
        .filter("x >= lo and x <= hi")
        .collect()
    )
    assert got == exp and len(got) > 0
    assert len(got) == len(set(got))  # exactly once


def test_range_join_binned_no_nested_loop(spark):
    """The plan contract: no CartesianProduct / BroadcastNestedLoopJoin —
    the whole point versus a raw range predicate."""
    pts = spark.range(100).selectExpr("id as pid", "cast(id as double) as x")
    ivs = spark.range(20).selectExpr(
        "id as iid", "cast(id * 5 as double) as lo", "cast(id * 5 + 12 as double) as hi"
    )
    plan = (
        range_join_binned(pts, ivs, bin_width=10.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rollup_multigrain(spark):
    out = rollup_multigrain(_ev(spark)).collect()
    by_key = {(r.day, r.hour): (r.grain, r.n_events, r.sum_value) for r in out}
    assert by_key[("2024-01-01", 0)] == ("hour", 5, 15.0)
    assert by_key[("2024-01-01", None)] == ("day", 5, 15.0)
    assert by_key[(None, None)] == ("total", 5, 15.0)


def test_sessionize_gap_property(spark):
    """Invariant over a pseudo-random event stream: two consecutive events
    of a user share a session IFF their gap <= gap_seconds; session_seq is
    non-decreasing and starts at 1 per user."""
    import datetime as dt
    import random

    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows, t = [], {}
    for i in range(300):
        u = rng.randrange(5)
        t[u] = t.get(u, t0) + dt.timedelta(seconds=rng.choice([30, 100, 500, 2000]))
        rows.append((i, t[u], u))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = sorted(
        sessionize(df, gap_seconds=600).collect(), key=lambda r: (r.user_id, r.ts)
    )
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for u, evs in by_user.items():
        assert evs[0].session_seq == 1
        for a, b in zip(evs, evs[1:]):
            gap = (b.ts - a.ts).total_seconds()
            same = b.session_seq == a.session_seq
            assert same == (gap <= 600), (u, gap, a.session_seq, b.session_seq)
            assert b.session_seq in (a.session_seq, a.session_seq + 1)
