"""End-to-end: Spark pipeline triples == miniature oracle triples (P/R = 1.0)
on the deterministic fixture corpus (SURVEY.md §5, §7.2 step 2-3)."""

from __future__ import annotations

import pytest

from pmcanalysis_spark.fixtures import (
    build_hierarchy_terms,
    build_lexicon,
    build_web_pages,
)
from pmcanalysis_spark.oracle import MiniOracle, approx_equal
from pmcanalysis_spark.pipeline import PipelineConfig, build_mentions, build_triples
from pmcanalysis_spark.schemas import HIERARCHY, WEB_PAGES


@pytest.fixture(scope="module")
def corpus():
    return build_web_pages(200)


@pytest.fixture(scope="module")
def lexicon():
    return build_lexicon()


def test_mentions_match_oracle(spark, corpus, lexicon):
    df = spark.createDataFrame(corpus, WEB_PAGES)
    entries = [(e.name, e.term_id) for e in lexicon]
    got = {
        (r.url, r.sent_idx, r.term_id, r.name, r.begin, r.end)
        for r in build_mentions(df, entries).collect()
    }
    oracle = MiniOracle(lexicon)
    expected = set()
    for p in corpus:
        if p["lang"] != "en":
            continue
        expected.update(tuple(m) for m in oracle.mentions_for_text(p["url"], p["text"]))
    assert expected, "fixture must plant at least some mentions"
    assert got == expected


def test_sentence_grain_routing_matches_fused_path(spark, corpus, lexicon):
    """Doc-level semantics are identical whichever scan path runs: the fused
    single-UDF hot path and the mention-table (sentence_grain=True) route
    must emit the same triples."""
    df = spark.createDataFrame(corpus, WEB_PAGES)
    entries = [(e.name, e.term_id) for e in lexicon]
    fused = {
        (r.subj, r.obj, r.nab, r.na, r.nb)
        for r in build_triples(df, entries).collect()
    }
    via_mentions = {
        (r.subj, r.obj, r.nab, r.na, r.nb)
        for r in build_triples(df, entries, sentence_grain=True).collect()
    }
    assert fused == via_mentions and fused


@pytest.mark.parametrize("use_hierarchy", [False, True])
def test_triples_match_oracle(spark, corpus, lexicon, use_hierarchy):
    _, closure = build_hierarchy_terms()
    df = spark.createDataFrame(corpus, WEB_PAGES)
    entries = [(e.name, e.term_id) for e in lexicon]
    hier_df = (
        spark.createDataFrame(closure, HIERARCHY) if use_hierarchy else None
    )
    cfg = PipelineConfig()
    got_rows = build_triples(df, entries, hierarchy=hier_df, cfg=cfg).collect()

    oracle = MiniOracle(lexicon, hierarchy=closure if use_hierarchy else None)
    exp_rows = oracle.triples(corpus)

    got = {(r.subj, r.obj): r for r in got_rows}
    exp = {(r[0], r[2]): r for r in exp_rows}
    assert set(got) == set(exp), (
        f"pair sets differ: only_spark={set(got) - set(exp)} "
        f"only_oracle={set(exp) - set(got)}"
    )
    assert got, "fixture must produce at least one scored pair"
    for key, er in exp.items():
        gr = got[key]
        assert gr.pred == er[1]
        assert (gr.nab, gr.na, gr.nb) == (er[8], er[9], er[10]), key
        for i, col in enumerate(["tscore", "zscore", "lmi", "npmi", "lgl"]):
            assert approx_equal(gr[col], er[3 + i]), (key, col, gr[col], er[3 + i])


def test_run_pipeline_neardup_stage(tmp_path):
    """--neardup materializes the cluster stage (one row per page; the
    deterministic fixture corpus has no near-dups, so all singletons) and
    resumes from its manifest on rerun."""
    import json
    import subprocess
    import sys

    outdir = str(tmp_path / "kgout_nd")
    cmd = [
        sys.executable, "scripts/run_pipeline.py",
        "--synthetic", "200", "--output", outdir, "--cores", "4", "--neardup",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["n_neardup_rows"] == 200 and not s1["neardup_resumed"]
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["n_neardup_rows"] == 200 and s2["neardup_resumed"]


def test_run_pipeline_clean_and_snapshot(tmp_path):
    """--clean gates pages through keep_filter (strict defaults drop the
    deliberately repetitive fixture corpus entirely; a relaxed dup bound
    lets it through unchanged), and --snapshot-table commits the canonical
    triples as a versioned snapshot."""
    import json
    import subprocess
    import sys

    outdir = str(tmp_path / "kgout_clean")
    table = str(tmp_path / "kgtable")
    base = [
        sys.executable, "scripts/run_pipeline.py",
        "--synthetic", "200", "--cores", "4", "--clean",
        "--snapshot-table", table,
    ]
    r1 = subprocess.run(
        base + ["--output", outdir, "--clean-max-dup-frac", "0.95"],
        capture_output=True, text=True, timeout=600,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["n_triples"] > 0 and s1["snapshot_id"] == 1
    r2 = subprocess.run(
        base + ["--output", str(tmp_path / "kgout_strict")],
        capture_output=True, text=True, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    # strict defaults: the synthetic corpus is all bigram-repetitive
    assert s2["n_triples"] == 0 and s2["snapshot_id"] == 2
