"""Sentence-grain pipeline (ParseMedline3 semantics) vs an independent
in-test oracle over the fixture corpus."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from pmcanalysis_spark.fixtures import build_hierarchy_terms, build_lexicon, build_web_pages
from pmcanalysis_spark.operators.sentence_grain import (
    mention_occurrence_counts,
    npmi_scored_sentence_pairs,
    rollup_counts,
    sentence_pair_counts,
)
from pmcanalysis_spark.oracle import MiniOracle, approx_equal
from pmcanalysis_spark.pipeline import build_mentions
from pmcanalysis_spark.schemas import HIERARCHY, WEB_PAGES


@pytest.fixture(scope="module")
def setup(spark):
    corpus = build_web_pages(150)
    lexicon = build_lexicon()
    df = spark.createDataFrame(corpus, WEB_PAGES)
    entries = [(e.name, e.term_id) for e in lexicon]
    mentions = build_mentions(df, entries).persist()
    oracle = MiniOracle(lexicon)
    oracle_mentions = []
    for p in corpus:
        if p["lang"] != "en":
            continue
        oracle_mentions.extend(oracle.mentions_for_text(p["url"], p["text"]))
    return mentions, oracle_mentions


def test_occurrence_counts_match(spark, setup):
    mentions, om = setup
    got = {r.term_id: r.cnt for r in mention_occurrence_counts(mentions).collect()}
    exp = Counter(m[2] for m in om)
    assert got == dict(exp)


def test_sentence_pairs_match(spark, setup):
    mentions, om = setup
    got = {
        (r.a_id, r.b_id): r.nab
        for r in sentence_pair_counts(mentions, "DOID:", "HP:").collect()
    }
    per_sent = defaultdict(set)
    for url, si, tid, _n, _b, _e in om:
        per_sent[(url, si)].add(tid)
    exp: Counter = Counter()
    for ids in per_sent.values():
        for a in ids:
            if not a.startswith("DOID:"):
                continue
            for b in ids:
                if b.startswith("HP:"):
                    exp[(a, b)] += 1
    assert got == dict(exp)


def test_pair_cap_drops_pathological_sentences(spark, setup):
    mentions, _ = setup
    full = sentence_pair_counts(mentions, "DOID:", "HP:").agg({"nab": "sum"}).first()[0]
    capped = (
        sentence_pair_counts(mentions, "DOID:", "HP:", max_pairs_per_sentence=1)
        .agg({"nab": "sum"})
        .first()[0]
    )
    assert capped is None or capped <= full


def test_rollup_counts(spark):
    counts = spark.createDataFrame(
        [("DOID:0000100", 5), ("DOID:0000101", 3)], "term_id string, cnt long"
    )
    _, closure = build_hierarchy_terms()
    hier = spark.createDataFrame(closure, HIERARCHY)
    got = {r.term_id: r.cnt for r in rollup_counts(counts, hier).collect()}
    # leaves keep their counts; mid + root get sums through the closure
    assert got["DOID:0000100"] == 5 and got["DOID:0000101"] == 3
    assert got["DOID:0000010"] == 8  # both leaves under mid 10
    assert got["DOID:0000001"] == 8  # root


def test_npmi_scoring_matches_scalar(spark, setup):
    from pmcanalysis_spark.functions.scores import npmi_py

    mentions, _ = setup
    occ = mention_occurrence_counts(mentions)
    pairs = sentence_pair_counts(mentions, "DOID:", "HP:")
    rows = npmi_scored_sentence_pairs(pairs, occ).collect()
    assert rows
    total = sum(r.cnt for r in occ.collect())
    for r in rows[:50]:
        assert approx_equal(r.npmi, npmi_py(total, r.na, r.nb, r.nab)), r
