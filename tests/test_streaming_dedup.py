"""Stateful streaming exact-dedup: state persists across micro-batches, so
a document re-crawled in a later batch is dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmcanalysis_spark.streaming.dedup_stream import streaming_exact_dedup


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    schema = "url string, html string"
    # batch 0: two distinct docs (plus an in-batch dup of u1 -> min id wins)
    spark.createDataFrame(
        [("u1", "<p>alpha</p>"), ("u1b", "<p>alpha</p>"), ("u2", "<p>beta</p>")],
        schema,
    ).coalesce(1).write.parquet(src + "/b=0")
    # batch 1: one new doc and a re-crawl of alpha under a new url
    spark.createDataFrame(
        [("u3", "<p>gamma</p>"), ("u9", "<p>alpha</p>")], schema
    ).coalesce(1).write.parquet(src + "/b=1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select url, text_hash from dedup_out").collect()
    by_hash = {}
    for r in rows:
        assert r["text_hash"] not in by_hash, "hash emitted twice"
        by_hash[r["text_hash"]] = r["url"]
    urls = set(by_hash.values())
    # alpha kept exactly once with the min url of its FIRST batch
    assert "u1" in urls and "u9" not in urls and "u1b" not in urls
    assert {"u2", "u3"} <= urls
    assert len(rows) == 3


def test_streaming_dedup_matches_batch_exact_dedup(spark, tmp_path):
    """Streaming result == batch exact_dedup canonical ids over the union."""
    from pmcanalysis_spark.operators.dedup import exact_dedup

    src = str(tmp_path / "in2")
    schema = "url string, html string"
    rows = [(f"u{i:02d}", f"<p>text {i % 7}</p>") for i in range(20)]
    spark.createDataFrame(rows[:10], schema).coalesce(1).write.parquet(src + "/b=0")
    spark.createDataFrame(rows[10:], schema).coalesce(1).write.parquet(src + "/b=1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["text_hash"], r["url"])
        for r in spark.sql("select * from dedup_out2").collect()
    }
    batch = spark.createDataFrame(rows, schema)
    exp = {
        (r["text_hash"], r["canonical_id"])
        for r in exact_dedup(batch, id_col="url", text_col="html").collect()
    }
    # batch exact_dedup keeps global min id; the stream keeps the min id of
    # the FIRST batch containing the hash — identical here because ids are
    # ordered by batch
    assert got == exp
