"""Streaming near-dup candidates: per-row MinHash banding parity with the
batch operator, cross-batch stateful pairing, and the bucket-membership cap."""

from __future__ import annotations

from pmcanalysis_spark.streaming.neardup_stream import (
    row_minhash_bands,
    streaming_neardup_candidates,
)


def test_row_minhash_bands_matches_batch_signatures(spark):
    """The narrow per-row signature must equal the batch groupBy-based
    minhash_signatures bit-for-bit (same shingles, affine family, banding
    format) — the property the streaming candidates' correctness rests on."""
    from pyspark.sql import functions as F

    from pmcanalysis_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    got = {
        (r.doc_id, r.band, r.bucket)
        for r in row_minhash_bands(
            docs, id_col="doc_id", text_col="text", num_hashes=8, bands=4
        ).collect()
    }
    sig = minhash_signatures(docs, id_col="doc_id", num_hashes=8)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        F.col("sig")[b * 2].cast("string"),
                        F.col("sig")[b * 2 + 1].cast("string"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band", "bucket"),
    )
    exp = {(r.doc_id, r.band, r.bucket) for r in banded.collect()}
    assert got == exp and len(got) > 0


def test_streaming_candidates_match_batch_lsh_pairs(spark, tmp_path):
    """Distinct streaming candidates over two micro-batches == batch
    minhash_lsh_pairs over the union corpus (cross-batch pairs included)."""
    from pmcanalysis_spark.operators.dedup import minhash_lsh_pairs

    src = str(tmp_path / "in")
    schema = "url string, text string"
    rows = [
        ("u01", "the quick brown fox jumps over the lazy dog near the barn"),
        ("u02", "the quick brown fox jumps over the lazy dog near the barn"),
        ("u03", "an entirely different document about spark window functions"),
        ("u04", "the quick brown fox jumps over the lazy dog near the fence"),
        ("u05", "an entirely different document about spark window functions"),
        ("u06", "totally unrelated words forming no shared shingles at all here"),
    ]
    spark.createDataFrame(rows[:3], schema).coalesce(1).write.parquet(src + "/b=0")
    spark.createDataFrame(rows[3:], schema).coalesce(1).write.parquet(src + "/b=1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    q = (
        streaming_neardup_candidates(stream, id_col="url", text_col="text")
        .writeStream.format("memory")
        .queryName("nd_cand")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["a_id"], r["b_id"])
        for r in spark.sql("select a_id, b_id from nd_cand").collect()
    }
    batch = spark.createDataFrame(rows, schema)
    exp = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(batch, id_col="url", text_col="text").collect()
    }
    assert got == exp
    # cross-batch pair present: u04 (batch 1) vs u01 (batch 0)
    assert ("u01", "u04") in got


def test_streaming_candidates_bucket_cap(spark, tmp_path):
    """max_bucket_members: arrivals beyond the cap still pair against the
    capped members (they stay detectable) but stop growing the clique."""
    src = str(tmp_path / "in2")
    schema = "url string, text string"
    text = "same boilerplate text repeated in every single crawled page here"
    rows = [(f"u{i}", text) for i in range(1, 5)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src + "/b=0")

    stream = spark.readStream.schema(schema).parquet(src + "/b=*")
    q = (
        streaming_neardup_candidates(
            stream, id_col="url", text_col="text", max_bucket_members=2
        )
        .writeStream.format("memory")
        .queryName("nd_cap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["a_id"], r["b_id"])
        for r in spark.sql("select a_id, b_id from nd_cap").collect()
    }
    # u1, u2 join the bucket; u3, u4 pair against them but not each other
    assert got == {
        ("u1", "u2"),
        ("u1", "u3"), ("u2", "u3"),
        ("u1", "u4"), ("u2", "u4"),
    }


def test_streaming_confirmed_matches_batch_scalable(spark, tmp_path):
    """The streaming path now ends at CONFIRMED pairs: distinct streaming
    (a_id, b_id, jaccard) over micro-batches == batch neardup_text_scalable
    on the union corpus (max_shingle_df=None — the corpus-wide hot-shingle
    bound is a batch-only statistic), cross-batch pairs included."""
    from pyspark.sql import functions as F

    from pmcanalysis_spark.operators.dedup import neardup_text_scalable
    from pmcanalysis_spark.streaming.neardup_stream import (
        streaming_neardup_confirmed,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("url"), "text")
    )
    parts = docs.collect()
    src = str(tmp_path / "in3")
    schema = "url string, text string"
    third = max(1, len(parts) // 3)
    for b, lo in enumerate(range(0, len(parts), third)):
        spark.createDataFrame(parts[lo:lo + third], schema).coalesce(1).write.parquet(
            f"{src}/b={b}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    q = (
        streaming_neardup_confirmed(
            stream, id_col="url", text_col="text",
            n=3, num_hashes=8, bands=4, threshold=0.5,
        )
        .writeStream.format("memory")
        .queryName("nd_conf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 9))
        for r in spark.sql("select * from nd_conf").collect()
    }
    exp = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 9))
        for r in neardup_text_scalable(
            docs, id_col="url", text_col="text",
            n=3, threshold=0.5, num_hashes=8, bands=4, max_shingle_df=None,
        ).collect()
    }
    assert len(exp) > 0
    assert got == exp
