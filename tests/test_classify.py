"""Naive Bayes quality classifier vs a straight-Python replica of the
formula (weights rounded at train time, decimal-exact score sums)."""

from __future__ import annotations

import math
from collections import Counter

from pmcanalysis_spark.operators.classify import nb_score, nb_train

ROWS = [
    (1, "good prose flows with varied vocabulary and clear meaning", 1),
    (2, "another fine document with actual sentences and real words", 1),
    (3, "clear writing good words fine prose varied meaning here now", 1),
    (4, "spam spam spam buy buy buy now now now click click click", 0),
    (5, "buy click spam buy click spam buy click spam buy click spam", 0),
    (6, "", 0),  # empty doc: trains into the prior only, scores prior-only
]


def _ref(rows, alpha=0.5):
    pos_c, neg_c = Counter(), Counter()
    n_pos = sum(1 for *_ , l in rows if l == 1)
    n_neg = len(rows) - n_pos
    for _, text, lab in rows:
        toks = [t for t in text.split(" ") if t]
        (pos_c if lab == 1 else neg_c).update(toks)
    vocab = set(pos_c) | set(neg_c)
    tp, tn, v = sum(pos_c.values()), sum(neg_c.values()), len(vocab)
    w = {
        t: round(
            math.log((pos_c[t] + alpha) / (tp + alpha * v))
            - math.log((neg_c[t] + alpha) / (tn + alpha * v)),
            6,
        )
        for t in vocab
    }
    prior = round(math.log((n_pos + alpha) / (n_neg + alpha)), 6)
    out = {}
    for did, text, _ in rows:
        toks = [t for t in text.split(" ") if t]
        s = round(sum(w.get(t, 0.0) for t in toks), 6)  # exact at 6dp terms
        total = prior + s
        out[did] = (round(total, 6), total > 0)
    return w, prior, out


def test_nb_matches_python_replica(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, keep int")
    model, prior = nb_train(docs)
    ref_w, ref_p, ref_scores = _ref(ROWS)
    got_w = {r.token: r.w for r in model.collect()}
    assert got_w == ref_w
    assert prior.collect()[0]["p"] == ref_p
    got = {
        r.doc_id: (r.score, r.pred)
        for r in nb_score(docs.select("doc_id", "text"), model, prior).collect()
    }
    assert got == ref_scores
    # it actually separates the planted classes
    assert got[1][1] and got[2][1] and got[3][1]
    assert not got[4][1] and not got[5][1]
    # empty doc scores exactly the prior
    assert got[6][0] == ref_p


def test_nb_score_unseen_tokens_contribute_zero(spark):
    train = spark.createDataFrame(ROWS, "doc_id long, text string, keep int")
    model, prior = nb_train(train)
    new = spark.createDataFrame(
        [(9, "wholly unseen tokens everywhere"), (10, "good prose spam")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in nb_score(new, model, prior).collect()}
    p = prior.collect()[0]["p"]
    assert got[9] == p  # all-unseen doc = prior
    w = {r.token: r.w for r in model.collect()}
    assert got[10] == round(p + round(w["good"] + w["prose"] + w["spam"], 6), 6)
