from __future__ import annotations

from pmcanalysis_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
)

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog near the old barn"),
    (2, "the quick brown fox jumps over the lazy dog near the old barn"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the old fence"),  # near dup
    (4, "completely different words about spark dataframes and shuffles here"),
]


def _docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark)).collect()
    sizes = sorted(r.cluster_size for r in out)
    assert sizes == [1, 1, 2]
    dup = [r for r in out if r.cluster_size == 2][0]
    assert dup.canonical_id == 1


def test_shingles_distinct_and_sized(spark):
    out = shingles(_docs(spark).filter("doc_id = 4"), "doc_id", "text", 3).collect()
    assert all(len(r.shingle.split(" ")) == 3 for r in out)
    # 9 tokens -> 7 trigrams, all distinct here
    assert len(out) == 7


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert (1, 2) in got  # exact dup has jaccard 1.0
    assert (1, 3) in got and (2, 3) in got  # near dup
    assert not any(4 in p for p in got)
    j12 = [r.jaccard for r in pairs if (r.a_id, r.b_id) == (1, 2)][0]
    assert j12 == 1.0


def test_minhash_identical_sigs_for_identical_text(spark):
    sigs = {r.doc_id: tuple(r.sig) for r in minhash_signatures(_docs(spark)).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    # near-dup shares most minhashes
    agree = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree >= 8


def test_minhash_lsh_candidates(spark):
    got = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert (1, 2) in got
    assert all(4 not in p for p in got)  # unrelated doc never pairs


def test_simhash_equal_for_equal_and_close_for_near(spark):
    hs = {r.doc_id: r.simhash for r in simhash64(_docs(spark)).collect()}
    assert hs[1] == hs[2]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 60) - 1)).count("1")

    assert hamming(hs[1], hs[3]) < hamming(hs[1], hs[4])


def test_embedding_neardup_scalable_recall(spark):
    """The LSH->confirm scale path recovers most of the brute-force pairs
    (recall < 1 by design — a pair is missed only if it separates in every
    table). On the sf0.001 corpus with planted near-dups, measured recall is
    asserted at a floor; confirmed pairs must be an exact subset with
    identical cosines."""
    from pyspark.sql import functions as F

    from pmcanalysis_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_scalable,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    aug = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(F.array(F.col("vec")[0] * 1.2), F.slice(F.col("vec"), 2, 63)).alias("vec"),
    )
    corpus = emb.unionByName(aug)
    brute = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in embedding_neardup_pairs(
            corpus, id_col="vec_id", vec_col="vec", threshold=0.95
        ).collect()
    }
    scal = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in embedding_neardup_scalable(
            corpus, id_col="vec_id", vec_col="vec",
            threshold=0.95, dim=64, num_planes=8, num_tables=4,
        ).collect()
    }
    assert len(brute) >= 25  # planted pairs exist
    # exact subset with identical cosine values
    for k, v in scal.items():
        assert k in brute and abs(v - brute[k]) < 1e-12
    recall = len(scal) / len(brute)
    assert recall >= 0.85, f"candidate recall {recall:.3f} below floor"
