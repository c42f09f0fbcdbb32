"""Streaming ingest mode (SURVEY.md §2.9).

The reference is batch-only; resumability is handled by snapshot lineage
(lineage.py), not state stores. This module exists because the engine's scan
stage IS streaming-shaped: swap ``spark.read`` for ``spark.readStream`` on
the same web_pages schema and the extract/NER stages run unchanged —
``detect_doc_terms`` is a stateless mapInPandas, legal in streaming plans.

Windowed mention counts use ``warc_ts`` watermarks for late data. Start with
``trigger(availableNow=True)`` to drain a backlog batch-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import WEB_PAGES


def read_web_pages_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source stream over a directory of web-page parquet drops.
    In production: ``readStream.format("iceberg")`` on the same table."""
    return (
        spark.readStream.format(fmt)
        .schema(WEB_PAGES)
        .option("maxFilesPerTrigger", 16)
        .load(path)
    )


def windowed_term_counts(
    doc_terms_ts: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-term mention counts in event-time windows over warc_ts, tolerant
    of ``watermark`` of late data.

    Takes doc_terms WITH warc_ts carried through the fused UDF
    (``detect_doc_terms(..., passthrough_cols=("warc_ts",))``). r1 joined
    the doc_terms stream back to the pages stream here — a stream-stream
    join whose state stores grow without bound under a continuous trigger
    (the watermark applied only after the join never purges join state).
    The passthrough removes the join entirely: one stateful operator
    (the windowed agg), bounded state, same result.
    """
    return (
        doc_terms_ts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "term_id")
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term_id",
            "n_docs",
        )
    )


def run_streaming_ingest(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    lexicon_entries: list[tuple[str, str]],
    available_now: bool = True,
):
    """End-to-end streaming job: pages stream -> fused extract+NER ->
    doc_terms appended to parquet with exactly-once checkpointing."""
    from ..nlp import detect_doc_terms

    pages = read_web_pages_stream(spark, input_path)
    dt = detect_doc_terms(pages, lexicon_entries)
    writer = (
        dt.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
