from __future__ import annotations

from pyspark.sql import functions as F

from pmcanalysis_spark.fixtures import build_web_pages
from pmcanalysis_spark.pipeline import ingest
from pmcanalysis_spark.schemas import WEB_PAGES


def test_range_partitioning_gives_disjoint_url_spans(spark):
    df = spark.createDataFrame(build_web_pages(200), WEB_PAGES)
    parts = (
        ingest(df, range_partitions=8)
        .select(F.spark_partition_id().alias("pid"), "url")
        .groupBy("pid")
        .agg(F.min("url").alias("lo"), F.max("url").alias("hi"), F.count("*").alias("n"))
        .orderBy("lo")
        .collect()
    )
    assert sum(r.n for r in parts) == 200
    assert len(parts) > 1
    for a, b in zip(parts, parts[1:]):
        assert a.hi < b.lo  # contiguous, non-overlapping key ranges


def test_ingest_noop_without_range_partitions(spark):
    df = spark.createDataFrame(build_web_pages(10), WEB_PAGES)
    assert ingest(df) is df
