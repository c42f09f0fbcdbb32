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
