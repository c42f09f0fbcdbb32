"""End-to-end training-data pipeline job (scripts/run_datapipe.py):
clean → dedup → decontaminate → mix → order → shard, resumable."""

from __future__ import annotations

import pytest

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

SF_DIR = "/root/testdata/sf0.001"


# measured-stress / e2e tier: excluded from the default profile (pytest.ini), run with -m slow
pytestmark = pytest.mark.slow

def _run(argv, capsys):
    import run_datapipe

    rc = run_datapipe.main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_datapipe_end_to_end_resume_and_decontam(spark, tmp_path, capsys):
    docs_path = f"{SF_DIR}/documents.parquet"
    # plant the eval corpus: 5 real training docs verbatim → guaranteed
    # n-gram contamination; those docs must not reach the shard manifest
    ev_path = str(tmp_path / "eval")
    docs = spark.read.parquet(docs_path)
    eval_docs = docs.filter("doc_id % 97 = 0").select("doc_id", "text")
    eval_ids = {r.doc_id for r in eval_docs.collect()}
    assert eval_ids
    eval_docs.write.parquet(ev_path)

    out_dir = str(tmp_path / "dp")
    argv = [
        "--input", docs_path, "--output", out_dir,
        "--eval", ev_path, "--target-tokens", "5000",
        "--tokens-per-shard", "500", "--cores", "4",
    ]
    first = _run(argv, capsys)
    assert first["final_docs"] > 0
    assert 0 < first["final_tokens"] <= 5000
    assert not any(s["resumed"] for s in first["stages"].values())
    assert set(first["stages"]) == {
        "keep", "exact_dedup", "decontam", "mix", "order", "shards"
    }

    # contaminated docs (the planted eval twins) never reach the shards
    shard_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out_dir, "shards", "data")).collect()
    }
    assert shard_ids and not (shard_ids & eval_ids)

    # shard layout: every shard except possibly the last respects the cap
    import pyspark.sql.functions as F

    shards = spark.read.parquet(os.path.join(out_dir, "shards", "data"))
    per = shards.groupBy("shard_id").agg(F.sum("n_tok").alias("t")).collect()
    max_doc = shards.agg(F.max("n_tok")).first()[0]
    for r in per:
        assert r.t <= 500 + max_doc  # greedy whole-doc overflow bound
    assert first["final_tokens"] == sum(r.t for r in per)

    # second run: byte-identical inputs → every stage resumes, same answer
    second = _run(argv, capsys)
    assert all(s["resumed"] for s in second["stages"].values())
    assert second["final_docs"] == first["final_docs"]
    assert second["final_tokens"] == first["final_tokens"]
    assert second["n_shards"] == first["n_shards"]

    # per-stage lineage rows exist (partition id, counts, key range)
    lin = spark.read.parquet(os.path.join(out_dir, "keep", "lineage"))
    assert {"partition_id", "row_count", "min_key", "max_key", "stage", "run_id"} <= set(
        lin.columns
    )


def test_datapipe_warc_input(spark, tmp_path, capsys):
    """--input-format warc: a directory of constructed .warc/.warc.gz files
    ingests through sources/warc.py into the same stage chain; the body
    text round-trips byte-faithfully into the keep gate, doc ids are the
    deterministic (uri, chunk, rec) hash, and source = the URI host."""
    import duckdb

    from pmcanalysis_spark.sources.warc import build_warc_record

    rows = duckdb.sql(
        f"select doc_id, text from '{SF_DIR}/documents.parquet' "
        "order by doc_id limit 80"
    ).fetchall()
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    for f in range(2):
        blob = b"".join(
            build_warc_record(
                f"https://site{d % 3}.example.org/doc/{d}",
                "2024-01-01T00:00:00Z",
                t.encode(),
                gzip_member=(f == 1),
            )
            for d, t in rows[f * 40 : (f + 1) * 40]
        )
        ext = ".warc.gz" if f == 1 else ".warc"
        (warc_dir / f"crawl-{f}{ext}").write_bytes(blob)

    out_dir = str(tmp_path / "out")
    res = _run(
        ["--input", str(warc_dir), "--input-format", "warc",
         "--output", out_dir, "--cores", "4"],
        capsys,
    )
    assert res["stages"]["keep"]["rows"] == 80
    assert res["final_docs"] > 0

    from pyspark.sql import functions as F

    keep = spark.read.parquet(os.path.join(out_dir, "keep", "data"))
    assert keep.count() == 80
    # doc ids are distinct hashes; every source is a site host
    assert keep.select("doc_id").distinct().count() == 80


def test_datapipe_incremental_store_across_runs(spark, tmp_path, capsys):
    """--incremental-store: run 1 bootstraps the signature store; run 2
    (a later crawl containing near-copies of run-1 docs) drops them and
    admits only genuinely-new content; run 3 still sees run 2's
    admissions. Deterministic long texts keep the keep-gate out of the
    way."""
    import pandas as pd

    stops = ["the", "is", "and", "of", "to", "that", "with", "for"]

    def mk(prefix):
        # stopword-interleaved distinct tokens: passes the keep gate
        # (quality 1.0, bigram dup_frac ~0, lang=en) without repetition
        return " ".join(
            f"{stops[i % 8]} {prefix}{i}word" for i in range(60)
        )

    base, other, third = mk("aa"), mk("bb"), mk("cc")

    def write(docs, p):
        pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"]).to_parquet(p)

    b1 = str(tmp_path / "b1.parquet")
    b2 = str(tmp_path / "b2.parquet")
    write([(1, base, "en", "w"), (2, other, "en", "w")], b1)
    # 11 = near-copy of 1; 12 = near-copy of 11 (new-new, higher id loses);
    # 13 = new content
    write([(11, base + " tail", "en", "w"), (12, base + " tail", "en", "w"),
           (13, third, "en", "w")], b2)

    store = str(tmp_path / "store")
    r1 = _run(["--input", b1, "--output", str(tmp_path / "o1"),
               "--incremental-store", store, "--neardup-threshold", "0.5",
               "--cores", "4"], capsys)
    assert r1["stages"]["incremental"]["bootstrap_version"] == 1
    assert r1["final_docs"] == 2

    r2 = _run(["--input", b2, "--output", str(tmp_path / "o2"),
               "--incremental-store", store, "--neardup-threshold", "0.5",
               "--cores", "4"], capsys)
    # 11 dups old 1 -> dropped; 12 exact-dups 11 -> gone at exact stage
    # (or as new-new higher id); only 13 survives
    assert r2["final_docs"] == 1
    assert r2["stages"]["incremental"]["dropped"] >= 1

    from pmcanalysis_spark.snapshots import SnapshotTable
    st = SnapshotTable(spark, store)
    ids = {r.doc_id for r in st.read().select("doc_id").collect()}
    assert 1 in ids and 2 in ids and 13 in ids
    assert 11 not in ids and 12 not in ids


def test_datapipe_line_dedup_and_dsir_stages(spark, tmp_path, capsys):
    """--line-dedup strips planted corpus-common lines before dedup (two
    pages differing only in boilerplate collapse to one survivor) and
    --dsir-target keeps only the importance-weight top fraction."""
    import pyspark.sql.functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    # plant: shared header on every doc; docs 9000/9001 share a body
    # (keep-filter-passing: varied bigrams, stopwords, no punctuation) and
    # differ ONLY in boilerplate repetition -> exact dedup misses them,
    # line_dedup (min_docs=3: the 2-doc body stays, the 62-doc header goes)
    # makes them byte-identical
    shared_body = (
        "the data of spark and window is it that for "
        "join scan merge sort hash part batch stream dup key"
    )
    extra = spark.createDataFrame(
        [
            (9000, f"NAV MENU\n{shared_body}", "en", "web"),
            (9001, f"NAV MENU\nNAV MENU\n{shared_body}", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text"))
    docs = base.withColumn(
        "text", F.concat(F.lit("NAV MENU\n"), F.col("text"))
    ).unionByName(extra)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)

    tgt_path = str(tmp_path / "tgt")
    base.filter("doc_id % 7 = 0").select("doc_id", "text").write.parquet(tgt_path)

    out_dir = str(tmp_path / "dp")
    res = _run(
        [
            "--input", docs_path, "--output", out_dir,
            "--line-dedup", "--line-min-docs", "3",
            "--dsir-target", tgt_path,
            "--dsir-keep-frac", "0.5", "--min-tokens", "5",
            "--tokens-per-shard", "500", "--cores", "4",
        ],
        capsys,
    )
    assert {"keep", "line_dedup", "exact_dedup", "dsir", "order", "shards"} <= set(
        res["stages"]
    )
    assert "threshold" in res["stages"]["dsir"]

    ld = spark.read.parquet(os.path.join(out_dir, "line_dedup", "data"))
    # the planted header was cut from every kept doc
    assert ld.filter(F.col("text").contains("NAV MENU")).count() == 0
    assert ld.filter("doc_id = 9000").first().n_removed >= 1

    # after the line cut, 9000 and 9001 are byte-identical -> exact dedup
    # merges them into one cluster (canonical = min id) and at most one
    # reaches the shard manifest
    xd = spark.read.parquet(os.path.join(out_dir, "exact_dedup", "data"))
    merged = xd.filter("canonical_id = 9000").first()
    assert merged is not None and merged.cluster_size == 2
    shard_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out_dir, "shards", "data")).collect()
    }
    assert len(shard_ids & {9000, 9001}) <= 1

    # dsir kept roughly the top half (within approx-quantile slack)
    wts = spark.read.parquet(os.path.join(out_dir, "dsir", "data"))
    n_scored = wts.count()
    n_final = res["final_docs"]
    assert n_final <= n_scored
    assert n_final >= int(0.3 * n_scored)


def test_datapipe_warc_host_rank_gate(spark, tmp_path, capsys):
    """--host-rank-drop-frac (WARC mode): link-graph PageRank over the
    crawl itself — spam.example.org links out but nothing links to it, so
    its pages are dropped before the keep gate; hub/mid pages survive."""
    from pmcanalysis_spark.sources.warc import build_warc_record

    def page(host, i, links_to):
        body = (
            f"<p>the data of crawl and page number {i} is here that for now</p>"
            + "".join(f'<a href="https://{h}/">see {h}</a>' for h in links_to)
        )
        return build_warc_record(
            f"https://{host}/p/{i}", "2024-01-01T00:00:00Z", body.encode()
        )

    blob = b"".join(
        [page("hub.example.org", i, ["mid.example.org"]) for i in range(4)]
        + [page("mid.example.org", i, ["hub.example.org"]) for i in range(4)]
        + [page("spam.example.org", i, ["hub.example.org"]) for i in range(3)]
    )
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    (warc_dir / "crawl.warc").write_bytes(blob)

    res = _run(
        ["--input", str(warc_dir), "--input-format", "warc",
         "--output", str(tmp_path / "out"),
         "--host-rank-drop-frac", "0.2", "--min-tokens", "5", "--cores", "4"],
        capsys,
    )
    assert res["stages"]["host_rank"]["dropped"] == 3
    assert res["stages"]["keep"]["rows"] == 8

    keep = spark.read.parquet(os.path.join(tmp_path / "out", "keep", "data"))
    assert keep.count() == 8
