"""Distributed BPE trainer vs a scalar reference implementation of the
Sennrich algorithm (the operator's correctness anchor — merge application
is inherently sequential per word, so there is no SQL oracle; this is the
fixture-verified tier, like NER and the streaming operators)."""

from __future__ import annotations

import pytest

from collections import Counter

from pmcanalysis_spark.operators.bpe import (
    END_OF_WORD,
    encode_bpe,
    train_bpe,
    word_freqs,
)


# --- scalar reference: Sennrich et al. 2016, get_stats / merge_vocab ---

def _ref_get_stats(vocab):
    stats = Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] += freq
    return stats


def _ref_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(words: dict[str, int], n_merges: int, min_pair_count: int = 2):
    vocab = [(list(w) + [END_OF_WORD], f) for w, f in sorted(words.items())]
    merges = []
    for rank in range(n_merges):
        stats = _ref_get_stats(vocab)
        if not stats:
            break
        # same tie-break as the operator: count DESC, then (a, b) ASC
        (a, b), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((rank, a, b, c))
        vocab = [(_ref_merge(s, a, b), f) for s, f in vocab]
    return merges, vocab


def _ref_encode(word: str, merges):
    s = list(word) + [END_OF_WORD]
    for _, a, b, _ in sorted(merges):
        s = _ref_merge(s, a, b)
    return s


CORPUS = [
    (1, "low low low lower lower newest newest newest newest widest"),
    (2, "newest widest widest low lowest lowest"),
    (3, "the newest of the new and the lowest of the low"),
]


@pytest.mark.slow
def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    words = Counter()
    for _, t in CORPUS:
        words.update(t.split(" "))
    expect, _ = _ref_train(dict(words), n_merges=12)
    got = train_bpe(docs, n_merges=12)
    assert got == expect
    # the classic corpus learns multi-char subwords, not just bigrams
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _ in got)


def test_train_bpe_overlap_semantics(spark):
    """'aaaa'-style runs: pair (a,a) counts at every adjacent position and
    merges left-to-right non-overlapping — reference semantics exactly."""
    rows = [(1, "aaaa aaaa aaa bb bb bb bb")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    words = {"aaaa": 2, "aaa": 1, "bb": 4}
    expect, _ = _ref_train(words, n_merges=4)
    got = train_bpe(docs, n_merges=4)
    assert got == expect
    # first merge must be (a, a): count = 2*3 + 1*2 = 8 > (b, b) = 4
    assert (got[0][1], got[0][2], got[0][3]) == ("a", "a", 8)


def test_train_bpe_min_pair_count_stops(spark):
    docs = spark.createDataFrame(
        [(1, "xy xy qz")], "doc_id long, text string"
    )
    got = train_bpe(docs, n_merges=50, min_pair_count=3)
    # only pairs with count >= 3: (y,</w>) appears 2+0.. nothing reaches 3
    # except none — 'xy' freq 2 gives (x,y)=2, (y,</w>)=2; qz gives 1s
    assert got == []


@pytest.mark.slow
def test_train_bpe_partitioning_invariant(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    one = train_bpe(docs.coalesce(1), n_merges=8)
    four = train_bpe(docs.repartition(4), n_merges=8)
    assert one == four


def test_encode_bpe_matches_reference_and_training(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=10)
    enc = {
        r.doc_id: (list(r.pieces), r.n_pieces)
        for r in encode_bpe(docs, merges).collect()
    }
    for did, text in CORPUS:
        expect = []
        for w in text.split(" "):
            expect.extend(_ref_encode(w, merges))
        assert enc[did] == (expect, len(expect)), did
    # unseen word falls back to finer pieces without error
    new = spark.createDataFrame(
        [(9, "lowestest zzz")], "doc_id long, text string"
    )
    row = encode_bpe(new, merges).collect()[0]
    got = list(row.pieces)
    expect = _ref_encode("lowestest", merges) + _ref_encode("zzz", merges)
    assert got == expect


def test_word_freqs(spark):
    docs = spark.createDataFrame(
        [(1, "a b  a"), (2, "b c")], "doc_id long, text string"
    )
    got = {r.word: r.freq for r in word_freqs(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}
