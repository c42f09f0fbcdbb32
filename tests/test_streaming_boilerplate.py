"""Streaming common-line detection == batch line_dedup's removed-line set,
across micro-batches; threshold crossings that SPAN batches emit exactly
once; within-doc repetition never counts twice."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmcanalysis_spark.operators.dedup import line_dedup
from pmcanalysis_spark.streaming.boilerplate_stream import streaming_common_lines

SCHEMA = "doc_id long, text string"

NAV = "Home | About | Contact"
COOKIE = "Accept Cookies"

B0 = [
    (1, f"{NAV}\nalpha article body\n{COOKIE}"),
    (2, f"{NAV}\nbeta article body"),  # NAV crosses threshold IN batch 0
]
B1 = [
    (3, f"{COOKIE}\ngamma article body"),  # COOKIE crosses ACROSS batches
    (4, "echo\necho\necho\ndelta body"),  # within-doc repeats: one doc
]
B2 = [
    (5, f"{NAV}\n{COOKIE}\nepsilon body"),  # both already emitted: no re-emit
    (6, "echo\nzeta body"),  # 'echo' reaches 2 distinct docs here
]


def _run_stream(spark, tmp_path, min_docs=2):
    src = str(tmp_path / "in")
    for i, b in enumerate((B0, B1, B2)):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(f"{src}/b={i}")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    out = streaming_common_lines(stream, min_docs=min_docs)
    q = (
        out.writeStream.format("memory")
        .queryName("common_lines_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return [r["line_key"] for r in spark.sql("select * from common_lines_out").collect()]


def test_streaming_common_lines_matches_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path)
    # exactly-once: no key appears twice even though every planted line
    # recurs in later batches
    assert len(got) == len(set(got))

    docs = spark.createDataFrame(B0 + B1 + B2, SCHEMA)
    ld = line_dedup(docs, min_docs=2)
    # batch removed-line keys: recompute from the operator's own semantics
    occ = (
        docs.select("doc_id", F.explode(F.split("text", "\n")).alias("line"))
        .select("doc_id", F.lower(F.trim("line")).alias("k"))
        .filter(F.col("k") != "")
        .distinct()
        .groupBy("k")
        .count()
        .filter("count >= 2")
    )
    expect = {r["k"] for r in occ.collect()}
    assert set(got) == expect == {NAV.lower(), COOKIE.lower(), "echo"}
    # and the batch operator removed exactly those lines from doc 5
    r5 = {r.doc_id: r for r in ld.collect()}[5]
    assert r5.n_removed == 2 and r5.text == "epsilon body"


def test_streaming_common_lines_within_doc_repeats_do_not_count(spark, tmp_path):
    """min_docs counts DISTINCT docs: 'echo' x3 inside doc 4 alone is not
    common until doc 6 arrives in a LATER batch."""
    got = _run_stream(spark, tmp_path, min_docs=3)
    # at min_docs=3: NAV reaches 3 distinct docs (1,2,5); COOKIE reaches 3
    # (1,3,5); echo only ever has 2 distinct docs -> never emitted
    assert sorted(got) == sorted([NAV.lower(), COOKIE.lower()])


def test_apply_line_cut_consumes_streamed_common_set(spark, tmp_path):
    """Detect-once / cut-many: the stream's emitted line_key table drives
    apply_line_cut, and the result equals the one-shot batch line_dedup."""
    from pmcanalysis_spark.operators.dedup import apply_line_cut

    got = _run_stream(spark, tmp_path)
    common = spark.createDataFrame([(k,) for k in got], "line_key string")
    docs = spark.createDataFrame(B0 + B1 + B2, SCHEMA)
    via_stream = {
        r.doc_id: (r.n_lines, r.n_removed, r.text)
        for r in apply_line_cut(docs, common).collect()
    }
    via_batch = {
        r.doc_id: (r.n_lines, r.n_removed, r.text)
        for r in line_dedup(docs, min_docs=2).collect()
    }
    assert via_stream == via_batch
    plan = apply_line_cut(docs, common)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
