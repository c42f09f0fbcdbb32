from __future__ import annotations

import math

from pmcanalysis_spark.linking import (
    build_term_profiles,
    link_mentions,
    score_links_py,
)

LEX = [
    ("tremor syndrome", "HP:1"),
    ("hand tremor", "HP:1"),
    ("shaking hands", "HP:1"),
    ("tremor syndrome", "MP:1"),
    ("mouse tremor", "MP:1"),
    ("murine shaking", "MP:1"),
]


def test_profiles_are_normalized():
    profiles = build_term_profiles(LEX)
    for tid, vec in profiles.items():
        n = math.sqrt(sum(w * w for w in vec.values()))
        assert math.isclose(n, 1.0), tid


def test_context_disambiguates():
    profiles = build_term_profiles(LEX)
    # context mentions "hand" -> HP:1 profile should win
    ranked = score_links_py(["patient", "hand", "weak"], ["HP:1", "MP:1"], profiles)
    assert ranked[0][0] == "HP:1" and ranked[0][1] > ranked[1][1]
    # context mentions "mouse"/"murine" -> MP:1 wins
    ranked = score_links_py(["murine", "model", "mouse"], ["HP:1", "MP:1"], profiles)
    assert ranked[0][0] == "MP:1"


def test_tie_breaks_deterministic():
    profiles = build_term_profiles(LEX)
    ranked = score_links_py(["nothing", "relevant"], ["MP:1", "HP:1"], profiles)
    assert [t for t, _ in ranked] == ["HP:1", "MP:1"]  # 0-score tie -> id order


def test_link_mentions_spark(spark):
    df = spark.createDataFrame(
        [
            ("u1", 0, "tremor syndrome", "patient shows tremor syndrome in left hand"),
            ("u2", 1, "tremor syndrome", "mouse model tremor syndrome murine line"),
        ],
        "url string, sent_idx int, name string, sentence string",
    )
    out = link_mentions(df, LEX).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)
    # both candidates linked (parity with reference multimap), ranked
    assert {r.term_id for r in by_url["u1"]} == {"HP:1", "MP:1"}
    top_u1 = min(by_url["u1"], key=lambda r: r.link_rank)
    top_u2 = min(by_url["u2"], key=lambda r: r.link_rank)
    assert top_u1.term_id == "HP:1"
    assert top_u2.term_id == "MP:1"


def test_bm25_scores_reference_formula(spark):
    """BM25 against a straight Python reimplementation on a 3-doc corpus
    (tf>1, df variation, length variation all exercised)."""
    import math

    from pmcanalysis_spark.linking import bm25_scores

    rows = [
        (1, "cancer cancer therapy outcome"),
        (2, "cancer study"),
        (3, "weather report today and tomorrow forecast"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lex = [("cancer", "DS:1"), ("therapy", "OP:1"), ("forecast", "X:1")]
    got = {
        (r.doc_id, r.term_id): (r.tf, r.bm25)
        for r in bm25_scores(docs, lex, k1=1.2, b=0.75).collect()
    }
    dls = {1: 4, 2: 2, 3: 6}
    avgdl = sum(dls.values()) / 3
    n = 3
    dfs = {"DS:1": 2, "OP:1": 1, "X:1": 1}
    tfs = {(1, "DS:1"): 2, (1, "OP:1"): 1, (2, "DS:1"): 1, (3, "X:1"): 1}
    exp = {}
    for (d, t), tf in tfs.items():
        idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        denom = tf + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl)
        exp[(d, t)] = (tf, round(idf * tf * 2.2 / denom, 6))
    assert got == exp


def test_anchor_entity_links_multimap_and_token_matching(spark):
    """Whole-token matching on normalized anchors; ambiguous names yield
    one edge per candidate id (name2id multimap); repeated tokens inside
    ONE anchor count once (edges count links, not token occurrences)."""
    from pmcanalysis_spark.linking import anchor_entity_links

    lex = spark.createDataFrame(
        [("join", "OP:2"), ("spark", "OP:9"), ("spark", "DS:9")],
        "name string, term_id string",
    )
    resolved = spark.createDataFrame(
        [
            ("a.org", "b.org", "Fast JOIN here"),      # case-normalized
            ("a.org", "b.org", "join join twice"),      # once per link
            ("a.org", "c.org", "the Spark engine"),     # multimap: 2 ids
            ("a.org", "c.org", "joinless prose"),       # substring != token
        ],
        "src_host string, dst_host string, anchor string",
    )
    got = {
        (r.term_id, r.dst_host): r.n_links
        for r in anchor_entity_links(resolved, lex).collect()
    }
    assert got == {
        ("OP:2", "b.org"): 2,
        ("OP:9", "c.org"): 1,
        ("DS:9", "c.org"): 1,
    }


def test_anchor_entity_links_broadcasts_lexicon(spark):
    from pmcanalysis_spark.linking import anchor_entity_links

    lex = spark.createDataFrame([("join", "OP:2")], "name string, term_id string")
    resolved = spark.createDataFrame(
        [("a.org", "b.org", f"join {i}") for i in range(40)],
        "src_host string, dst_host string, anchor string",
    )
    plan = (
        anchor_entity_links(resolved, lex)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "partial_count" in plan
