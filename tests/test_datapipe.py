"""End-to-end training-data pipeline job (scripts/run_datapipe.py):
clean → dedup → decontaminate → mix → order → shard, resumable."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

SF_DIR = "/root/testdata/sf0.001"


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
