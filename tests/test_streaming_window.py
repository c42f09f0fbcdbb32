from __future__ import annotations

from pmcanalysis_spark.fixtures import build_lexicon, build_web_pages
from pmcanalysis_spark.nlp import detect_doc_terms
from pmcanalysis_spark.schemas import WEB_PAGES
from pmcanalysis_spark.streaming.ingest import (
    read_web_pages_stream,
    windowed_term_counts,
)


def test_windowed_term_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    pages = build_web_pages(80)
    spark.createDataFrame(pages, WEB_PAGES).write.parquet(src)
    lex = [(e.name, e.term_id) for e in build_lexicon()]

    stream = read_web_pages_stream(spark, src)
    dt_stream = detect_doc_terms(stream, lex, passthrough_cols=("warc_ts",))
    windowed = windowed_term_counts(dt_stream, window="1 hour", watermark="2 hours")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select window_start, term_id, sum(n_docs) as n from win_counts group by 1, 2"
    ).collect()
    assert got, "windowed counts must be non-empty"

    # batch equivalent over the same input
    batch_pages = spark.read.parquet(src)
    from pyspark.sql import functions as F

    dt = detect_doc_terms(batch_pages, lex)
    ts = batch_pages.select(F.col("url").alias("doc_id"), "warc_ts")
    exp = (
        dt.join(ts, "doc_id")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "term_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "term_id", "n")
        .collect()
    )
    # append mode only emits windows CLOSED by the final watermark
    # (watermark = max event time - 2h; window closes when end <= watermark)
    import datetime as dt

    max_ts = batch_pages.agg(F.max("warc_ts")).first()[0]
    final_wm = max_ts - dt.timedelta(hours=2)
    got_set = {(r.window_start, r.term_id, r.n) for r in got}
    exp_closed = {
        (r.window_start, r.term_id, r.n)
        for r in exp
        if r.window_start + dt.timedelta(hours=1) <= final_wm
    }
    assert exp_closed, "test corpus must span enough hours to close windows"
    assert got_set == exp_closed
