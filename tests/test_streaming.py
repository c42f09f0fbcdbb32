from __future__ import annotations

from pmcanalysis_spark.fixtures import build_lexicon, build_web_pages
from pmcanalysis_spark.schemas import WEB_PAGES
from pmcanalysis_spark.streaming.ingest import run_streaming_ingest


def test_streaming_ingest_drains_backlog(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = build_web_pages(60)
    spark.createDataFrame(pages, WEB_PAGES).write.parquet(src)

    lex = [(e.name, e.term_id) for e in build_lexicon()]
    q = run_streaming_ingest(spark, src, out, ckpt, lex, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.columns == ["term_id", "doc_id"]
    n1 = got.count()
    assert n1 > 0

    # restart with no new files: exactly-once checkpoint -> no duplicates
    q2 = run_streaming_ingest(spark, src, out, ckpt, lex, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_keep_filter_runs_on_stream(spark, tmp_path):
    """keep_filter is a single narrow select, so it is stream-safe by
    construction: the same operator object runs unchanged on a file stream
    and emits batch-identical rows across micro-batches."""
    from pmcanalysis_spark.operators.textstats import keep_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "kf_in")
    rows = docs.collect()
    half = len(rows) // 2
    schema = docs.schema
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(src + "/b=0")
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.parquet(src + "/b=1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    q = (
        keep_filter(stream)
        .writeStream.format("memory")
        .queryName("kf_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from kf_stream").collect()}
    exp = {tuple(r) for r in keep_filter(docs).collect()}
    assert got == exp and len(got) == len(rows)
