"""Streaming decontamination == batch decontaminate, across micro-batches
(the streaming path is stateless, so parity is row-for-row on any split)."""

from __future__ import annotations

from pmcanalysis_spark.operators.dedup import decontaminate
from pmcanalysis_spark.streaming.decontam_stream import (
    collect_eval_grams,
    streaming_decontaminate,
)

SCHEMA = "doc_id long, text string"

LEAK = "the capital of france is paris obviously enough"

TRAIN_B0 = [
    (1, f"padding words before {LEAK} and after it too"),
    (2, "a perfectly clean document with entirely original content here"),
    (3, "tiny"),
]
TRAIN_B1 = [
    (4, f"{LEAK} {LEAK} twice for a double hit and padding"),
    (5, "another clean page that shares nothing with the benchmark set"),
]
EVAL = [(100, f"q: {LEAK} a: yes")]


def test_streaming_matches_batch_decontaminate(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame(TRAIN_B0, SCHEMA).coalesce(1).write.parquet(src + "/b=0")
    spark.createDataFrame(TRAIN_B1, SCHEMA).coalesce(1).write.parquet(src + "/b=1")
    ev = spark.createDataFrame(EVAL, SCHEMA)
    grams = collect_eval_grams(ev, n=8)
    assert grams  # the leak really produces eval 8-grams

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    out = streaming_decontaminate(stream, grams, n=8)
    q = (
        out.writeStream.format("memory")
        .queryName("decontam_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_contaminated"], r["contam_frac"], r["contaminated"]
        )
        for r in spark.sql("select * from decontam_out").collect()
    }

    train = spark.createDataFrame(TRAIN_B0 + TRAIN_B1, SCHEMA)
    expect = {
        r["doc_id"]: (
            r["n_grams"], r["n_contaminated"], r["contam_frac"], r["contaminated"]
        )
        for r in decontaminate(train, ev, n=8).collect()
    }
    assert got == expect
    assert got[1][3] is True and got[4][3] is True
    assert got[2][3] is False and got[3] == (0, 0, 0.0, False)
