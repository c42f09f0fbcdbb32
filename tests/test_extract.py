"""Byte-identical text extraction per url — the per-row invariant
(BASELINE.json input_hint; reference extractor ParsePMC.groovy:243)."""

from __future__ import annotations

from pmcanalysis_spark.extract import extract_text_py, extract_text_udf
from pmcanalysis_spark.fixtures import build_web_pages
from pmcanalysis_spark.schemas import WEB_PAGES


def test_pure_python_extractor_matches_fixture_text():
    pages = build_web_pages(120)
    for p in pages:
        assert extract_text_py(p["html"]) == p["text"], p["url"]


def test_extractor_strips_boilerplate_and_lowercases():
    html = (
        b"<html><head><title>IGNORED</title><script>var x=1;</script></head>"
        b"<body><nav>Nav Junk</nav><p>Hello   WORLD</p><p>Second &amp; para</p>"
        b"<footer>foot</footer></body></html>"
    )
    assert extract_text_py(html) == "hello world second & para"


def test_extractor_handles_nested_and_unclosed():
    assert extract_text_py(b"<p>outer <b>bold</b> tail") == "outer bold tail"
    assert extract_text_py(b"<script><p>never</p></script>") == ""
    assert extract_text_py(None) == ""


def test_udf_bytes_match_golden_column(spark):
    pages = build_web_pages(100)
    df = spark.createDataFrame(pages, WEB_PAGES)
    got = (
        df.select("url", "text", extract_text_udf("html").alias("extracted"))
        .collect()
    )
    for r in got:
        assert r["extracted"] == r["text"], r["url"]
