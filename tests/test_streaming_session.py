"""Streaming sessionization: cross-batch state continuation and exact
parity with the batch operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmcanalysis_spark.operators.events import sessionize
from pmcanalysis_spark.streaming.session_stream import streaming_sessionize


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Split the sf0.001-scale event fixture into three per-user-ordered
    micro-batches: streaming session assignments must equal the batch
    sessionize on the union — including sessions that SPAN a batch
    boundary (state carries last-ts + seq across batches)."""
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "ts")
        .filter(F.col("user_id") < 40)
    )
    rows = sorted(events.collect(), key=lambda r: (r.ts, r.event_id))
    src = str(tmp_path / "sess_in")
    schema = "event_id long, user_id long, ts timestamp"
    third = max(1, len(rows) // 3)
    for b, lo in enumerate(range(0, len(rows), third)):
        spark.createDataFrame(rows[lo:lo + third], schema).coalesce(1).write.parquet(
            f"{src}/b={b}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    q = (
        streaming_sessionize(stream, gap_seconds=600)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_id: (r.user_id, r.session_seq, r.session_id)
        for r in spark.sql("select * from sess_stream").collect()
    }
    exp = {
        r.event_id: (r.user_id, r.session_seq, r.session_id)
        for r in sessionize(events, gap_seconds=600).collect()
    }
    assert len(got) == len(rows)
    assert got == exp
    # the parity is non-trivial: at a 10-min gap some users have >1 session
    assert max(s for _, s, _ in exp.values()) > 1
