"""Property-based tests (SURVEY.md §5): score-function invariants and
operator algebraic properties, via Hypothesis on the pure-Python scalars
(the Spark Column exprs are pinned to these by tests/test_scores.py)."""

from __future__ import annotations

import pytest

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pmcanalysis_spark.functions.scores import lmi_py, npmi_py, tscore_py, zscore_py
from pmcanalysis_spark.nlp import TokenTrie
from pmcanalysis_spark.oracle import trapezoid_auc

counts = st.integers(min_value=1, max_value=10**6)


@st.composite
def contingency(draw):
    total = draw(st.integers(min_value=4, max_value=10**6))
    x = draw(st.integers(min_value=1, max_value=total))
    y = draw(st.integers(min_value=1, max_value=total))
    xy = draw(st.integers(min_value=1, max_value=min(x, y)))
    return float(total), float(x), float(y), float(xy)


@given(contingency())
@settings(max_examples=200, deadline=None)
def test_npmi_bounded_above_by_one(c):
    t, x, y, xy = c
    v = npmi_py(t, x, y, xy)
    if not math.isnan(v) and not math.isinf(v):
        # mathematically npmi <= 1; the float quotient of two ln() values
        # can overshoot by a few ulps (hypothesis found +4.3e-12)
        assert v <= 1.0 + 1e-9


@given(contingency(), st.integers(min_value=1, max_value=100))
@settings(max_examples=200, deadline=None)
def test_npmi_monotone_in_xy(c, bump):
    """More co-occurrence (x, y, total fixed) never lowers npmi."""
    t, x, y, xy = c
    xy2 = min(min(x, y), xy + bump)
    v1, v2 = npmi_py(t, x, y, xy), npmi_py(t, x, y, xy2)
    if any(math.isnan(v) or math.isinf(v) for v in (v1, v2)):
        return
    assert v2 >= v1 - 1e-9


@given(contingency())
@settings(max_examples=200, deadline=None)
def test_scores_symmetric_in_x_y(c):
    """Pair scores are symmetric under swapping the two terms."""
    t, x, y, xy = c
    for fn in (npmi_py, tscore_py, zscore_py, lmi_py):
        a, b = fn(t, x, y, xy), fn(t, y, x, xy)
        if math.isnan(a) or math.isnan(b):
            assert math.isnan(a) and math.isnan(b)
        else:
            assert math.isclose(a, b, rel_tol=1e-12)


@given(st.lists(st.tuples(st.floats(0, 1), st.floats(0, 1)), min_size=2, max_size=50))
@settings(max_examples=100, deadline=None)
def test_auc_bounded(points):
    pts = sorted(set(points))
    if len(pts) < 2:
        return
    v = trapezoid_auc(pts)
    span = pts[-1][0] - pts[0][0]
    assert -1e-9 <= v <= span + 1e-9


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=3), min_size=1, max_size=12
    )
)
@settings(max_examples=100, deadline=None)
def test_trie_spans_non_overlapping_and_sorted(tokens):
    trie = TokenTrie.from_lexicon(
        [("a a", "T:1"), ("a a a", "T:2"), ("b b", "T:3"), ("aaaa", "T:4")],
        min_name_len=2,
    )
    spans = trie.find(tokens)
    for (b1, e1, _n1, _i1), (b2, e2, _n2, _i2) in zip(spans, spans[1:]):
        assert e1 <= b2  # non-overlapping, left-to-right
    for b, e, name, _ids in spans:
        assert tokens[b:e] == name.split()


def test_closure_idempotent():
    """Applying the (transitive) closure twice adds nothing."""
    from collections import defaultdict

    closure = [("a", "mid"), ("a", "root"), ("mid", "root")]
    docs = {"a": {"d1", "d2"}, "mid": {"d3"}}

    def close(by_term):
        out = defaultdict(set, {k: set(v) for k, v in by_term.items()})
        for t, anc in closure:
            if t in out:
                out[anc] |= out[t]
        return out

    once = close(docs)
    twice = close(once)
    assert once == twice


# --- S6 transitive closure properties (r2) --------------------------------

_edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).map(
        lambda t: (f"n{t[0]}", f"n{t[1]}")
    ),
    max_size=40,
)


def _reachable(edges):
    """Reference closure by fixpoint iteration (independent of the DFS)."""
    parents = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
    clo = {c: set(ps) for c, ps in parents.items()}
    changed = True
    while changed:
        changed = False
        for c in list(clo):
            add = set()
            for p in clo[c]:
                add |= clo.get(p, set())
            if not add <= clo[c]:
                clo[c] |= add
                changed = True
    return {(c, a) for c, ps in clo.items() for a in ps if a != c}


@given(_edge_lists)
@settings(max_examples=200, deadline=None)
def test_transitive_closure_matches_fixpoint(edges):
    from pmcanalysis_spark.sources.obo import transitive_closure

    got = set(transitive_closure(edges))
    assert got == _reachable(edges)


@given(_edge_lists)
@settings(max_examples=200, deadline=None)
def test_transitive_closure_is_transitive_and_irreflexive(edges):
    from pmcanalysis_spark.sources.obo import transitive_closure

    clo = set(transitive_closure(edges))
    assert all(a != b for a, b in clo)
    have = {}
    for a, b in clo:
        have.setdefault(a, set()).add(b)
    for a, b in clo:
        for c in have.get(b, ()):
            if c != a:
                assert (a, c) in clo, (a, b, c)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=4, max_size=4
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_geomean_simm_scalar_reference(feature_rows):
    """F6 scalar reference: exp(mean(ln(nonzero))) == pow(prod, 1/n)."""
    for feats in feature_rows:
        nz = [f for f in feats if f > 0]
        if not nz:
            continue
        prod = 1.0
        for f in nz:
            prod *= f
        via_pow = math.pow(prod, 1.0 / len(nz))
        via_log = math.exp(sum(math.log(f) for f in nz) / len(nz))
        assert abs(via_pow - via_log) < 1e-9


# --- codec roundtrip properties (r3: pure-numpy JPEG / pure-stdlib GIF) ----

@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3), st.integers(1, 3), st.integers(0, 2**32 - 1),
)
def test_jpeg_gray_roundtrip_property(bh, bw, seed):
    """Any random gray image (1-3 blocks each way), encoded with q=1 by the
    independent test encoder, decodes within 2 gray levels (DCT+rounding
    error bound)."""
    import numpy as np
    from test_jpeg import Q1, encode_jpeg

    from pmcanalysis_spark.jpeg import decode_jpeg_pixels

    rng = np.random.RandomState(seed)
    px = rng.randint(30, 226, size=(bh * 8, bw * 8)).astype(float)
    got = decode_jpeg_pixels(encode_jpeg([px], [Q1], [(1, 1)]))
    assert got is not None and got.shape == (bh * 8, bw * 8, 1)
    assert np.max(np.abs(got[:, :, 0].astype(float) - px)) <= 2


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1),
    st.booleans(),
)
def test_gif_roundtrip_property(w, h, seed, grow):
    """Any random paletted image roundtrips the GIF LZW decoder EXACTLY
    (lossless format), through both test encoders (constant-width and
    width-growing)."""
    import numpy as np
    from test_multimodal import PAL4, _encode_gif

    from pmcanalysis_spark.multimodal import decode_gif_pixels

    rng = np.random.RandomState(seed)
    idx = rng.randint(0, 4, size=(h, w))
    got = decode_gif_pixels(_encode_gif(idx, PAL4, grow=grow))
    assert got is not None
    assert np.array_equal(got, np.array(PAL4, dtype=np.uint8)[idx])


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=400))
def test_codecs_never_crash_on_garbage(payload):
    """decode_pixels and the WAV/GIF/JPEG decoders must return None (never
    raise) on arbitrary bytes — including bytes that START like a valid
    magic number."""
    from pmcanalysis_spark.jpeg import decode_jpeg_pixels
    from pmcanalysis_spark.multimodal import (
        decode_gif_pixels,
        decode_pixels,
        decode_wav_samples,
    )

    for prefix in (b"", b"\xff\xd8", b"GIF89a", b"\x89PNG\r\n\x1a\n",
                   b"RIFF\x10\x00\x00\x00WAVE", b"BM", b"P5 "):
        p = prefix + payload
        decode_pixels(p)
        decode_jpeg_pixels(p)
        decode_gif_pixels(p)
        decode_wav_samples(p)


# --- r4: URL canonicalization is idempotent and scheme/host-lowering ------

_url_st = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}{path}{q}{frag}"
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    host=st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,20}\.[A-Za-z]{2,5}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9._~-]{0,10}){0,4}/?", fullmatch=True),
    q=st.sampled_from(["", "?a=1", "?utm_source=x&b=2"]),
    frag=st.sampled_from(["", "#top", "#a/b?c"]),
)


@given(st.lists(_url_st, min_size=1, max_size=30, unique=True))
@settings(max_examples=20, deadline=None)
def test_canonical_url_idempotent(urls):
    """canonical(canonical(u)) == canonical(u): the canonical form is a
    fixed point, so re-running dedup over already-canonical URLs is a
    no-op — the property that makes the operator safe to compose."""
    from pyspark.sql import functions as F

    from pmcanalysis_spark.operators.dedup import canonical_url
    from pmcanalysis_spark.session import get_spark

    spark = get_spark(app_name="pmcanalysis-tests", cores=4, shuffle_partitions=4)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c1"))
    twice = once.select(F.col("c1"), canonical_url(F.col("c1")).alias("c2"))
    rows = twice.collect()
    for r in rows:
        assert r.c2 == r.c1, (r.c1, r.c2)
        assert "#" not in r.c1 and "?" not in r.c1
        scheme = r.c1.split("://", 1)[0]
        assert scheme == scheme.lower()


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=20
    ),
    st.integers(min_value=2, max_value=16),
)
@settings(max_examples=15, deadline=None)
@pytest.mark.slow
def test_pack_sequences_conservation(texts, seq_len):
    """Invariants for any corpus and chunk size: total tokens across chunks
    equals the corpus token count; every chunk except the highest id is
    exactly full; chunk ids are the contiguous range 0..n-1."""
    from pyspark.sql import functions as F

    from pmcanalysis_spark.operators.textstats import pack_sequences
    from pmcanalysis_spark.session import get_spark

    spark = get_spark(app_name="pmcanalysis-tests", cores=4, shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunks = sorted(
        (r.chunk_id, r.n_tokens)
        for r in pack_sequences(docs, seq_len=seq_len, partitions=3).collect()
    )
    total = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).collect()[0][0] or 0
    assert sum(n for _, n in chunks) == total
    if chunks:
        assert [c for c, _ in chunks] == list(range(len(chunks)))
        assert all(n == seq_len for _, n in chunks[:-1])


# --- line_dedup vs a scalar Python reference over random corpora ---

_LINE_WORDS = ["nav", "accept", "cookies", "body", "alpha", "beta", "  ", ""]


@st.composite
def line_corpus(draw):
    n_docs = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n_docs):
        n_lines = draw(st.integers(min_value=0, max_value=6))
        lines = [
            " ".join(
                draw(
                    st.lists(st.sampled_from(_LINE_WORDS), min_size=0, max_size=3)
                )
            )
            for _ in range(n_lines)
        ]
        docs.append((i, "\n".join(lines)))
    return docs


def _line_dedup_py(docs, min_docs=2):
    from collections import defaultdict

    by_key = defaultdict(set)
    for did, text in docs:
        for line in text.split("\n"):
            k = line.strip().lower()
            if k:
                by_key[k].add(did)
    common = {k for k, s in by_key.items() if len(s) >= min_docs}
    out = {}
    for did, text in docs:
        kept, n_lines, n_removed = [], 0, 0
        for line in text.split("\n"):
            k = line.strip().lower()
            if not k:
                continue
            n_lines += 1
            if k in common:
                n_removed += 1
            else:
                kept.append(line)
        if n_lines:
            out[did] = (n_lines, n_removed, "\n".join(kept))
    return out


@given(line_corpus(), st.integers(min_value=1, max_value=3))
@settings(max_examples=25, deadline=None)
@pytest.mark.slow
def test_line_dedup_matches_python_reference(spark, corpus, min_docs):
    from pmcanalysis_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.text)
        for r in line_dedup(docs, min_docs=min_docs).collect()
    }
    assert got == _line_dedup_py(corpus, min_docs)
