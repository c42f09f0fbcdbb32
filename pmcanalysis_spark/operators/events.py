"""Event-time analytics operators: sessionization, as-of join, binned range
join, multi-granularity rollup.

These are the operators the task brief names as "operators Spark lacks"
(as-of join, range join, hypertable rollup) plus gap-based sessionization —
each expressed as a composition of existing DataFrame ops (option (a) of
the brief's custom-operator ladder), so Catalyst optimizes them like any
other plan and every one carries a DuckDB oracle.

Scale notes: sessionize and asof_join_prior window PER USER (the natural
partition key — state per task is one user's ordered events; skewed users
bound by their own event count, not the corpus). The range join avoids the
O(n·m) theta-join plan Spark would otherwise produce (BroadcastNestedLoop)
by binning: intervals explode to covering bins, points map to exactly one
bin, the join is an equi-join on bin + residual filter — work ∝ overlaps +
interval_count·(len/bin_width), the classic interval-bucketing trick
(Databricks' range-join hint does the same under the hood). Rollup is one
pass producing every grain via partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_id, user_id, ts, session_seq, session_id): gap-based
    sessionization — a new session starts when more than ``gap_seconds``
    pass since the user's previous event. session_seq numbers a user's
    sessions from 1; session_id = 'user#seq' is the stable key downstream
    aggregations group on. Deterministic: events order by (ts, event_id)
    so equal timestamps cannot flip sessions between runs."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
            > gap_seconds
        ),
        1,
    ).otherwise(0)
    seq = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        seq.cast("long").alias("session_seq"),
        F.concat(
            F.col(user_col).cast("string"), F.lit("#"), seq.cast("string")
        ).alias("session_id"),
    )


def asof_join_prior(
    events: DataFrame,
    match_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """As-of join within the event stream: for EVERY event, the most recent
    STRICTLY PRIOR event of ``match_type`` by the same user — (event_id,
    user_id, ts, asof_event_id, asof_value), NULLs when no prior match.

    The classic as-of (trade ⋈ latest quote at-or-before) expressed as a
    per-key ordered window with an ignore-nulls last over the preceding
    frame — one shuffle on the user key, no join at all, which beats the
    union-and-window trick and by construction cannot produce the
    O(trades·quotes) theta join. Ties on ts break by event id (the stream's
    arrival order), so 'prior' is well-defined and deterministic."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = F.when(
        F.col(type_col) == match_type,
        F.struct(F.col(id_col).alias("i"), F.col(value_col).alias("v")),
    )
    last_match = F.last(marked, ignorenulls=True).over(w)
    return events.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        last_match["i"].alias("asof_event_id"),
        F.round(last_match["v"], 6).alias("asof_value"),
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "x",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 10.0,
) -> DataFrame:
    """Interval containment join without the nested-loop plan: every
    (point row ⨯ interval row) pair with lo <= x <= hi, but executed as an
    EQUI-join on bin id. Intervals explode to the bins they cover; a point
    lives in exactly ONE bin, so each qualifying pair meets exactly once —
    no distinct needed. Work ∝ matches + Σ_interval ceil(len/bin_width),
    versus the O(points·intervals) BroadcastNestedLoopJoin Spark plans for
    a raw range predicate (plan-contract tested). Choose bin_width near the
    median interval length; all other columns pass through both sides."""
    ibinned = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    pbinned = points.withColumn("_bin", F.floor(F.col(point_col) / bin_width))
    return (
        pbinned.join(ibinned, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )


def rollup_multigrain(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style continuous aggregate at every grain in ONE pass:
    GROUP BY ROLLUP(day, hour) — (day, hour) rows, (day) subtotals, and the
    grand total, labeled by grain. Partial aggregation computes the finest
    grain map-side; coarser grains reduce the fine buckets, never the raw
    events (Spark's Expand + partial-agg plan), which is exactly what a
    TimescaleDB-style rollup materializes. Sums run through DECIMAL(28,6)
    (cross-engine float recipe)."""
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    hour = F.hour(F.col(ts_col)).cast("int")
    base = events.select(day.alias("day"), hour.alias("hour"), F.col(value_col))
    return (
        base.rollup("day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(28,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .select(
            "day",
            "hour",
            F.when(F.col("day").isNull(), "total")
            .when(F.col("hour").isNull(), "day")
            .otherwise("hour")
            .alias("grain"),
            "n_events",
            "sum_value",
        )
    )
