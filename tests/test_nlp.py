"""DictionaryNameFinder-parity mention semantics (SURVEY.md N1-N3, P2)."""

from __future__ import annotations

from pmcanalysis_spark.fixtures import build_lexicon
from pmcanalysis_spark.nlp import TokenTrie, split_sentences_py, tokenize_py


def test_sentence_split():
    assert split_sentences_py("a b. c d! e?") == ["a b.", "c d!", "e?"]
    assert split_sentences_py("") == []


def test_tokenize_lowercases():
    assert tokenize_py("Anemia of Inflammation.") == ["anemia", "of", "inflammation"]


def test_longest_match_prefix_pair():
    trie = TokenTrie.from_lexicon(
        [("anemia", "DOID:1"), ("anemia of inflammation", "DOID:2")]
    )
    toks = "x anemia of inflammation y anemia z".split()
    spans = trie.find(toks)
    assert [(b, e, n) for b, e, n, _ in spans] == [
        (1, 4, "anemia of inflammation"),
        (5, 6, "anemia"),
    ]


def test_ambiguous_name_links_all_candidates():
    trie = TokenTrie.from_lexicon([("tremor syndrome", "HP:1"), ("tremor syndrome", "MP:1")])
    spans = trie.find("a tremor syndrome b".split())
    assert len(spans) == 1
    assert spans[0][3] == ("HP:1", "MP:1")


def test_minlength_filter_drops_short_names():
    trie = TokenTrie.from_lexicon([("flu", "DOID:9"), ("cold", "DOID:8")])
    assert trie.find(["flu"]) == []
    assert len(trie.find(["cold"])) == 1


def test_non_overlapping_resume_after_match():
    trie = TokenTrie.from_lexicon([("aaaa bbbb", "T:1"), ("bbbb cccc", "T:2")])
    spans = trie.find("aaaa bbbb cccc".split())
    # greedy longest-match consumes "aaaa bbbb"; "bbbb cccc" never fires
    assert [(s[0], s[1]) for s in spans] == [(0, 2)]


def test_fixture_lexicon_edge_cases_present():
    lex = build_lexicon()
    names = {e.name for e in lex}
    assert "anemia" in names and "anemia of inflammation" in names
    assert "flu" in names  # present in lexicon, dropped by MINLENGTH at build
    by_name = {}
    for e in lex:
        by_name.setdefault(e.name, set()).add(e.term_id)
    assert len(by_name["tremor syndrome"]) == 2  # ambiguity


# --- N4: POS/chunk + ngram expansion (ParseMedline.groovy:141-191) ---------

def test_n4_chunks_split_on_boundaries():
    from pmcanalysis_spark.nlp import noun_chunks_py, tokenize_py

    toks = tokenize_py("the red table stands in the big room")
    chunks = noun_chunks_py(toks)
    assert [(s, c) for s, c in chunks] == [
        (1, ["red", "table", "stands"]),
        (6, ["big", "room"]),
    ]


def test_n4_hits_never_cross_chunks_and_overlap():
    """The two contract differences vs the trie (N3): hits cannot cross a
    chunk boundary (the trie WOULD match 'stands in the big' across it),
    and every matching ngram is emitted — overlaps included — because the
    reference fed each chunk ngram to the finder independently."""
    from pmcanalysis_spark.nlp import (
        TokenTrie,
        chunk_ngram_hits_py,
        lexicon_name_map,
        tokenize_py,
    )

    lex = [
        ("red table", "T:1"),
        ("table", "T:2"),
        ("stands in the big", "T:3"),  # crosses the 'in the' boundary
        ("big room", "T:4"),
    ]
    toks = tokenize_py("the red table stands in the big room")
    hits = chunk_ngram_hits_py(toks, lexicon_name_map(lex))
    names = {h[2] for h in hits}
    assert names == {"red table", "table", "big room"}  # no cross-chunk hit
    # overlap: both 'red table' and the contained 'table' are emitted
    assert ("red table" in names) and ("table" in names)
    # the plain trie DOES match across the chunk boundary (longest-match)
    trie_names = {m[2] for m in TokenTrie.from_lexicon(lex).find(toks)}
    assert "stands in the big" in trie_names


def test_n4_spark_operator(spark):
    from pmcanalysis_spark.nlp import detect_mentions_chunked

    df = spark.createDataFrame(
        [("u1", "the red table stands in the big room. nothing here.")],
        "url string, text string",
    )
    lex = [("red table", "T:1"), ("red table", "T:9"), ("big room", "T:4")]
    rows = detect_mentions_chunked(df, lex).collect()
    got = {(r.term_id, r.name, r.begin, r.end) for r in rows}
    # ambiguity preserved: one row per candidate id (J1 multimap semantics)
    assert ("T:1", "red table", 1, 3) in got and ("T:9", "red table", 1, 3) in got
    assert ("T:4", "big room", 6, 8) in got
    assert all(r.sent_idx == 0 for r in rows)
