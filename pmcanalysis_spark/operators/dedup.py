"""Deduplication operators for large-scale training-data pipelines.

All portable-hash based (md5 prefix -> bigint) so DuckDB oracles can verify
bit-for-bit, and all expressed as native Column algebra (zero Python UDFs):

- exact_dedup: hash-groupBy, keep min doc_id per identical text.
- ngram_jaccard_pairs: shingle -> explode -> self-join on shingle ->
  |∩| from match count, |∪| from set sizes (inclusion-exclusion).
- minhash_signatures / minhash_lsh_pairs: k permutations via seeded portable
  hash, banding -> bucket self-join -> candidate pairs (the scale path: the
  shingle self-join above is quadratic on hot shingles; LSH bounds work to
  band-bucket collisions).
- simhash64: 64-bit simhash from token hashes, via bit-position explode +
  weighted majority (pure SQL algebra, oracle-checkable).

- neardup_text_scalable: THE text near-dup scale path — MinHash-LSH
  candidates, then the exact n-gram Jaccard computed ONLY on candidate
  pairs (mirrors embedding_neardup_scalable's candidates->confirm shape).

Scale notes: shingle/bucket joins shuffle on the shingle/bucket hash — a
well-distributed key by construction; hot shingles (boilerplate n-grams)
are the skew risk, bounded BY DEFAULT (``max_shingle_df="auto"`` drops
shingles in >50% of docs — standard practice: they carry no dedup signal
and are exactly the quadratic-join fuel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gram_index(toks, n: int):
    """Window start indices 0..size-n when the document has at least ``n``
    tokens, else an EMPTY array — every index then yields a full n-token
    window, so the old per-gram ``size(split(gram)) == n`` re-tokenization
    filter (guide §1.2 "per-task work": it re-split every generated gram)
    is unnecessary. Emitted grams are identical: the filter only ever
    dropped the single short window of a doc with < n tokens, which this
    never generates."""
    return F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))


def portable_hash64(col, seed: int = 0):
    """Deterministic cross-engine 60-bit hash: first 15 hex chars of
    md5(seed || value) as bigint. DuckDB equivalent:
    CAST(concat('0x', substr(md5(concat(CAST(seed AS VARCHAR), '|', v)),1,15)) AS BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed)), F.lit("|"), col)), 1, 15), 16, 10
    ).cast("long")


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    confirm_full_text: bool = False,
    hash_expr=None,
) -> DataFrame:
    """Exact duplicate clusters: (text-hash, canonical doc_id, cluster size).

    Default: groupBy on the 128-bit md5 (collision-safe enough at 10^12 docs
    for candidate selection). ``confirm_full_text=True`` is the
    hash-collision-paranoid mode: the group key is (hash, full text), so a
    collision yields two rows under the same text_hash instead of one merged
    cluster — the cost is shuffling the text column as part of the key.
    ``hash_expr`` overrides the hash (tests inject a deliberately colliding
    one to prove the confirm splits what the default merges)."""
    h = (hash_expr if hash_expr is not None else F.md5(F.col(text_col))).alias(
        "text_hash"
    )
    if confirm_full_text:
        return (
            docs.groupBy(h, F.col(text_col).alias("_text"))
            .agg(
                F.min(id_col).alias("canonical_id"),
                F.count("*").alias("cluster_size"),
            )
            .drop("_text")
        )
    return (
        docs.groupBy(h)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("cluster_size"),
        )
    )


def shingles_raw(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) word n-grams WITHOUT the per-doc distinct — for
    consumers that are duplicate-invariant (MinHash takes a min over the
    permuted hashes, so repeated shingles cannot change any signature) and
    would otherwise pay the distinct's full exchange for nothing (r6)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        gram_index(toks, n), lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle")
    )


def shingles(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams. Native: split + index
    sequence + transform + explode — no Python."""
    return shingles_raw(docs, id_col, text_col, n).distinct()


def _drop_hot_shingles(
    sh: DataFrame,
    docs: DataFrame,
    id_col: str,
    max_shingle_df,
    strip_shingles: DataFrame | None = None,
):
    """Drop boilerplate shingles before any shingle self-join.

    ``max_shingle_df``: "auto" (default across the module) drops shingles
    whose document frequency exceeds half the corpus — a shingle in >50% of
    docs carries no dedup signal and is exactly what makes the self-join
    quadratic at scale; an int sets the absolute df bound; None disables.
    The "auto" bound stays inside the DAG (count aggregate cross-joined, no
    driver action). ``strip_shingles``: optional explicit strip-list — e.g.
    ``textstats.top_ngrams`` output renamed to a ``shingle`` column — removed
    with one left_anti join."""
    if strip_shingles is not None:
        sh = sh.join(
            F.broadcast(strip_shingles.select("shingle")), "shingle", "left_anti"
        )
    if max_shingle_df == "auto":
        total = docs.select(F.countDistinct(F.col(id_col)).alias("_n_docs"))
        hot = (
            sh.groupBy("shingle")
            .count()
            .crossJoin(F.broadcast(total))
            .filter(F.col("count") * 2 > F.col("_n_docs"))
        )
        return sh.join(hot.select("shingle"), "shingle", "left_anti")
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        return sh.join(hot.select("shingle"), "shingle", "left_anti")
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | str | None = "auto",
    strip_shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard >= threshold.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|); the intersection comes from the
    shingle self-join match count, set sizes from a per-doc count — no
    arrays ever materialize per pair. Jaccard is computed over the FILTERED
    shingle space (sizes counted after the hot-shingle drop), so the bound
    changes semantics only for boilerplate-dominated pairs — by design.
    """
    sh = _drop_hot_shingles(
        shingles(docs, id_col, text_col, n), docs, id_col, max_shingle_df,
        strip_shingles,
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


MERSENNE61 = (1 << 61) - 1


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig: array<bigint>) — sig[i] = min over shingles of the i-th
    permutation hash. One shuffle (groupBy doc).

    Permutations use the standard affine family g_i = (h1 + i*h2) mod
    (2^61-1) derived from ONE md5 per shingle (h1 = hex[1:15], h2 =
    hex[16:30]) — 60-bit values, so h1 + i*h2 stays under 2^63 for i <= 7
    and under 2^63 needs i*h2 < 2^63 - 2^60: safe for num_hashes <= 4 only…
    so h2 is reduced mod 2^57 first, keeping i*h2 < 2^61 for i < 16. All
    integer ops exist verbatim in DuckDB for the oracle.

    ``shingles_df``: optional pre-computed (doc_id, shingle) table — pass a
    persisted/materialized shingle stage to share one corpus scan across the
    signature and confirm branches (see ``neardup_text_scalable``).
    """
    assert num_hashes <= 16, "affine-family derivation sized for <= 16 hashes"
    # duplicate shingles cannot change a min, so the default path skips the
    # per-doc distinct exchange entirely (r6); an explicitly passed
    # shingles_df (shared/materialized stage) is used as-is
    sh = (
        shingles_df
        if shingles_df is not None
        else shingles_raw(docs, id_col, text_col, n)
    )
    md5 = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.pmod(F.conv(F.substring(md5, 16, 15), 16, 10).cast("long"),
                F.lit(1 << 57).cast("long"))
    hashed = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    mins = [
        F.min(F.pmod(F.col("h1") + F.lit(i) * F.col("h2"),
                     F.lit(MERSENNE61).cast("long"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = hashed.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates: split the signature into ``bands`` bands of
    num_hashes/bands rows; docs colliding on any full band are candidates.
    Returns distinct (a_id, b_id). Scale path for near-dedup: work is
    proportional to bucket collisions, not doc pairs. ``shingles_df``:
    optional pre-computed (doc_id, shingle) table (see
    ``minhash_signatures``)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, n, num_hashes, shingles_df)
    banded = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col("sig")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    # explicit width: the banded table is tiny in bytes while bucket
    # collisions expand quadratically — keep AQE from coalescing the
    # expansion narrow (see hamming_pairs)
    banded = banded.repartition(
        sig.sparkSession.sparkContext.defaultParallelism, "band", "bucket"
    )
    a = banded.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("_siga"),
        "band", "bucket",
    )
    b = banded.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("_sigb"),
        "band", "bucket",
    )
    # FIRST-SHARED-BAND dedup instead of .distinct() (r6): a pair whose
    # signatures agree on several bands used to enter the exchange once per
    # band; both sides carry the signature array, so "some earlier band
    # also agrees" is a scalar in-stage predicate (array indexing stays in
    # whole-stage codegen) and the kept set is exactly the distinct set.
    def _band_eq(j: int):
        cond = F.col("_siga")[j * rows_per_band] == F.col("_sigb")[j * rows_per_band]
        for r in range(1, rows_per_band):
            cond = cond & (
                F.col("_siga")[j * rows_per_band + r]
                == F.col("_sigb")[j * rows_per_band + r]
            )
        return cond

    earlier = F.lit(False)
    for j in range(bands - 1):
        earlier = earlier | ((F.col("band") > j) & _band_eq(j))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(~earlier)
        .select("a_id", "b_id")
    )


def neardup_text_scalable(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    max_shingle_df: int | str | None = "auto",
    materialize_shingles: bool = False,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Text near-dup pairs, MinHash-LSH candidates -> exact-Jaccard confirm.

    What a real 100 TB text dedup run executes (the text twin of
    ``embedding_neardup_scalable``): candidates come from MinHash banding
    (work ∝ band-bucket collisions, never the quadratic shingle self-join),
    then the exact n-gram Jaccard is computed ONLY on candidate pairs by
    joining candidates back to the per-doc shingle sets — the same
    inclusion-exclusion arithmetic as ``ngram_jaccard_pairs``, but the
    intersection join is candidate-restricted: work ∝ Σ_cand |A|, not
    Σ_shingle df².

    Output is a SUBSET of ``ngram_jaccard_pairs(same args)`` — equal values
    on every emitted pair, missing only pairs LSH never proposed. Candidate
    recall follows the standard S-curve P[candidate] =
    1 - (1 - j^(num_hashes/bands))^bands: at 8 hashes / 4 bands (rows=2),
    j=0.8 gives ~0.98, j=0.5 gives ~0.68 — raise bands (or lower rows per
    band) to push recall at the cost of more candidates (measured on the
    sf0.001/sf0.01 documents in tests/test_dedup.py).

    Plan at scale: every shuffle key is well-distributed (band buckets from
    minhash values, then doc ids); the candidate set is tiny relative to the
    corpus, so the confirm joins are cheap; the hot-shingle bound (on by
    default) applies to the confirm's Jaccard space exactly as in
    ``ngram_jaccard_pairs`` so the two operators agree pairwise.

    The shingle subtree is referenced by SIX branches (minhash signatures,
    the hot-shingle df count + anti-join base, sizes, a-side, b-side) and
    Catalyst does not CSE across branches — unmaterialized, each branch
    re-runs the tokenize+explode over the corpus. ``materialize_shingles``
    persists the raw + hot-filtered shingle stages so the operator tokenizes
    the corpus once. Default False: the r5 A/B at sf0.1 steady state
    (interleaved, best-of-3 after warmup, quiet box) measured the persist
    LOSING ~15% (3.80 s vs 4.46 s, ordering consistent in all reps) — on
    OS-cached parquet the re-scans are cheaper than materializing the
    exploded shingle table into the block store (PLANS.md "Shingle persist
    A/B"). Flip it (or pass ``shingles_df``, e.g. a
    ``lineage.materialize_stage`` checkpoint) on a real cluster where the
    corpus scan is cold remote storage and 6 scans of 100 TB dwarf one
    shingle materialization. Values are identical either way (persist
    changes execution, not semantics) — oracle hashes prove it.
    """
    from pyspark.storagelevel import StorageLevel

    sh_raw = (
        shingles_df
        if shingles_df is not None
        else shingles(docs, id_col, text_col, n)
    )
    if materialize_shingles and shingles_df is None:
        sh_raw = sh_raw.persist(StorageLevel.MEMORY_AND_DISK)
    # the signature branch is duplicate-invariant (min over permuted
    # hashes), so when nothing is shared/materialized it skips the distinct
    # exchange by letting minhash build its own raw gram stream (r6)
    cand = minhash_lsh_pairs(
        docs, id_col, text_col, n, num_hashes, bands,
        shingles_df=sh_raw if (shingles_df is not None or materialize_shingles)
        else None,
    )
    sh = _drop_hot_shingles(sh_raw, docs, id_col, max_shingle_df)
    if materialize_shingles:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    # confirm via per-doc HASH SETS (r6): pack each doc's hot-filtered
    # shingles into one sorted 60-bit-hash array (the same h1 identity the
    # MinHash permutations and the incremental signature store already
    # use), then attach the two arrays to each LSH candidate and intersect
    # JVM-side. This replaces two exploded-shingle joins + an intersection
    # groupBy + a sizes aggregate with ONE groupBy(doc) and two narrow
    # id-joins — per-pair work is O(|A|+|B|) on candidates only, per-row
    # memory bounded by the largest single doc, and h1 collisions perturb
    # a Jaccard by ~|A|·|B|/2^60 (vanishing; the DuckDB oracle replays the
    # identical hash so the value check stays exact).
    hs = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_set(portable_hash64(F.col("shingle")))).alias("_hs")
    )
    return (
        cand.join(
            hs.select(F.col("doc_id").alias("a_id"), F.col("_hs").alias("_ha")),
            "a_id",
        )
        .join(
            hs.select(F.col("doc_id").alias("b_id"), F.col("_hs").alias("_hb")),
            "b_id",
        )
        .withColumn("n_inter", F.size(F.array_intersect("_ha", "_hb")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("_ha") + F.size("_hb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def neardup_text_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    max_shingle_df: int | str | None = "auto",
    materialize_shingles: bool = False,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """The full text-dedup endgame: LSH candidates -> exact-Jaccard confirm
    (``neardup_text_scalable``) -> connected components -> one
    (doc_id, cluster_id) row per document, cluster_id = min doc id of the
    component (singletons map to themselves). This is the cluster-collapse
    answer to quadratic pair output over near-dup cliques (PLANS.md): a
    k-clone cluster costs k rows here, not k², and the canonical id is what
    a training pipeline actually keeps."""
    from ..canonicalize import connected_components

    pairs = neardup_text_scalable(
        docs, id_col, text_col, n, threshold, num_hashes, bands, max_shingle_df,
        materialize_shingles=materialize_shingles, shingles_df=shingles_df,
    )
    # connected_components drives several actions over the edges (size probe
    # + collect/iterate) and persists its edge projection internally (r4), so
    # the candidates->confirm chain executes once — the r3 caller-side
    # persist (which fixed a measured 2.5x re-run) is now redundant.
    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    verts = docs.select(F.col(id_col).alias("id")).distinct()
    cc = connected_components(edges, vertices=verts)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def neardup_signature_store(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc near-dup signature store row:
    ``(doc_id, buckets array<string>[bands], sh array<bigint> sorted)`` —
    everything incremental dedup needs to admit FUTURE batches without
    ever touching this batch's text again. ``buckets[b]`` is the MinHash
    LSH band key (identical to ``minhash_lsh_pairs`` banding); ``sh`` is
    the doc's distinct shingle identity set under the 60-bit md5-prefix
    hash the MinHash permutations already derive (h1) — the confirm space
    of ``neardup_incremental``. Storing hashes, not shingle strings, caps
    the store at 8 bytes/shingle regardless of n-gram width; h1 collisions
    perturb a Jaccard by ~|A|·|B|/2^60 — vanishing, and the SQL oracle
    replays the identical hash so the check is still value-exact.

    This is the batch twin of the streaming confirm state
    (``streaming/neardup_stream``): same bucket keys, same packed shingle
    store, but laid out as a plain table you append per crawl. ONE corpus
    scan, ONE groupBy(doc): minhash mins, the bucket keys, and the sorted
    hash set all come out of the same aggregate.
    """
    assert num_hashes <= 16, "affine-family derivation sized for <= 16 hashes"
    rows_per_band = num_hashes // bands
    # duplicate-invariant consumers only (min + collect_set): raw grams,
    # no distinct exchange (r6)
    sh = (
        shingles_df
        if shingles_df is not None
        else shingles_raw(docs, id_col, text_col, n)
    )
    md5 = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.pmod(
        F.conv(F.substring(md5, 16, 15), 16, 10).cast("long"),
        F.lit(1 << 57).cast("long"),
    )
    hashed = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    mins = [
        F.min(
            F.pmod(
                F.col("h1") + F.lit(i) * F.col("h2"),
                F.lit(MERSENNE61).cast("long"),
            )
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = hashed.groupBy("doc_id").agg(
        *mins, F.sort_array(F.collect_set("h1")).alias("sh")
    )
    buckets = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.col(f"h{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    return agg.select("doc_id", buckets.alias("buckets"), "sh")


def neardup_incremental(
    new_docs: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Incremental crawl dedup: near-dup the NEW batch against everything
    ever admitted WITHOUT re-shingling the old corpus — the production
    shape at 100 TB (admitting a 1 TB crawl must cost ∝ crawl + collisions,
    never ∝ corpus; re-running ``neardup_text_scalable`` over old∪new
    re-pays the full corpus scan + signature build every batch).

    Returns ``(pairs, new_store_rows)``: pairs = (a_id, b_id, jaccard)
    where at LEAST one side is new (new×old and new×new; old×old pairs
    were already emitted when the old batch was admitted), a_id < b_id,
    exact Jaccard >= threshold; new_store_rows = this batch's signature
    rows — append them to the store (plain union / snapshot commit) to
    admit the next batch.

    Plan: ONE scan of the new batch builds its store rows
    (``neardup_signature_store``); candidates are a band-bucket equi-join
    of the new rows' buckets against (store ∪ new) buckets — work ∝
    bucket collisions involving a new doc; confirm joins each candidate
    pair back to the two stored hash sets by doc id and intersects
    JVM-side (``array_intersect`` — O(|A|+|B|) per pair, per-row memory
    bounded by the largest single doc). No hot-shingle df filter here:
    the confirm never self-joins the shingle table (that filter exists to
    bound df² explosion in the full-corpus confirm join), so a
    boilerplate shingle costs candidates only what the banding already
    admitted. Every shuffle key (band buckets, doc ids) is uniform.
    """
    new_store = neardup_signature_store(
        new_docs, id_col, text_col, n, num_hashes, bands
    )
    all_store = store.unionByName(new_store)
    new_b = new_store.select(
        F.col("doc_id").alias("n_id"), F.posexplode("buckets").alias("band", "bucket")
    )
    all_b = all_store.select(
        F.col("doc_id").alias("o_id"), F.posexplode("buckets").alias("band", "bucket")
    )
    cand = (
        new_b.join(all_b, ["band", "bucket"])
        .filter(F.col("n_id") != F.col("o_id"))
        .select(
            F.least("n_id", "o_id").alias("a_id"),
            F.greatest("n_id", "o_id").alias("b_id"),
        )
        .distinct()
    )
    a_side = all_store.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    b_side = all_store.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(a_side, "a_id")
        .join(b_side, "b_id")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return pairs, new_store


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, cosine) where
    cosine >= threshold, a_id < b_id. Brute-force baseline (correctness
    anchor); route candidates through similarity.lsh_bucketed_topk at scale.
    """
    from .similarity import _dot, _norm

    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("norm", _norm(F.col("vec"), dim))
    a = v.select(F.col("id").alias("a_id"), F.col("vec").alias("va"), F.col("norm").alias("na_"))
    b = v.select(F.col("id").alias("b_id"), F.col("vec").alias("vb"), F.col("norm").alias("nb_"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (_dot(F.col("va"), F.col("vb"), dim) / (F.col("na_") * F.col("nb_"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_scalable(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    max_group_size: int | None = 4096,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-candidates -> exact-cosine confirm.

    THE verified scale path (r2): candidates come from ``num_tables``
    independent hyperplane-LSH tables (bucket self-joins — work ∝ bucket
    collisions, never all-pairs); the exact cosine then confirms
    >= threshold. Recall < 1 by design: a true pair is missed only if the
    two vectors land in different buckets in EVERY table; for cosine 0.95
    (angle ~18°) and 8 planes, per-table collision ~(1-0.101)^8 ≈ 0.43, so
    4 tables give ~1-(0.57)^4 ≈ 0.90 candidate recall (measured on the
    sf0.01 embeddings in tests/test_dedup.py). Raise num_tables (or lower
    num_planes) for higher recall at more candidate cost.

    Confirmed pairs are a SUBSET of embedding_neardup_pairs' output (cosines
    agree after ROUND(x, 6) — BLAS blocked summation vs the sequential
    fold). Plan: ONE narrow mapInPandas pass computes all
    num_tables×num_planes sign bits with a single V @ P.T matmul per Arrow
    batch (a Column-expression bucket tree at 4×8×64 nodes measurably
    chokes plan optimization), posexplode to (table, bucket) rows carrying
    the vector, then ONE pairwise matmul per bucket confirms >= threshold
    INSIDE the group (applyInPandas) — confirmed pairs are rare, so the
    cross-table dedup groupBy that follows is tiny. Confirming inside the
    bucket beats confirm-after-distinct by ~candidates/vectors in Arrow
    transfer (measured 81.6s -> ~3s at 100k vectors, 20M candidates): each
    vector crosses Python once per table, never once per candidate pair.
    At 100 TB every shuffle key here is well-distributed (bucket ids from
    random hyperplanes, then pair ids); a residual mega bucket (many
    near-identical vectors hash together BY DESIGN) is bounded by
    ``max_group_size``: oversized buckets split into chunk-pair groups of
    <= 2*max_group_size rows (similarity._chunk_pairs) — each vector pair
    still meets exactly once, so the confirm output is unchanged.
    """
    import numpy as np
    import pandas as pd

    from .similarity import plane_component_py

    P = [
        [plane_component_py(t * num_planes + p, d) for d in range(dim)]
        for t in range(num_tables)
        for p in range(num_planes)
    ]

    def bucketize(batches):
        Pm = np.asarray(P, dtype="float64")  # (T*planes, dim)
        w = 1 << np.arange(num_planes, dtype="int64")
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf["vec"].to_numpy())
            S = (V @ Pm.T) >= 0.0  # (n, T*planes)
            B = S.reshape(len(pdf), num_tables, num_planes) @ w  # (n, T)
            vn = np.sqrt((V * V).sum(axis=1))
            vn[vn == 0.0] = 1.0  # zero-vector guard (cosine 0, not NaN)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype="int64"),
                    "vec": pdf["vec"],
                    "norm": vn,
                    "buckets": list(B),
                }
            )

    empty = pd.DataFrame(
        {
            "a_id": pd.Series([], dtype="int64"),
            "b_id": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )

    def _emit(x, y, cos):
        keep = cos >= threshold
        if not keep.any():
            return empty
        x, y = x[keep], y[keep]
        return pd.DataFrame(
            {
                "a_id": np.minimum(x, y),
                "b_id": np.maximum(x, y),
                "cosine": cos[keep],
            }
        )

    def confirm_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n <= 1:
            return empty
        ids = pdf["id"].to_numpy(dtype="int64")
        V = np.vstack(pdf["vec"].to_numpy())
        norms = pdf["norm"].to_numpy(dtype="float64")
        G = (V @ V.T) / np.outer(norms, norms)
        iu = np.triu_indices(n, 1)
        return _emit(ids[iu[0]], ids[iu[1]], G[iu])

    def confirm_chunk_pair(pdf: "pd.DataFrame") -> "pd.DataFrame":
        """One (tbl, bucket, ci, cj) chunk-pair: ci == cj confirms within
        the chunk (triu), ci < cj confirms the cross block — every pair in
        the bucket is checked in exactly one chunk-pair group."""
        n = len(pdf)
        if n <= 1:
            return empty
        ci, cj = int(pdf["ci"].iat[0]), int(pdf["cj"].iat[0])
        ids = pdf["id"].to_numpy(dtype="int64")
        V = np.vstack(pdf["vec"].to_numpy())
        norms = pdf["norm"].to_numpy(dtype="float64")
        if ci == cj:
            G = (V @ V.T) / np.outer(norms, norms)
            iu = np.triu_indices(n, 1)
            return _emit(ids[iu[0]], ids[iu[1]], G[iu])
        ma = pdf["_c"].to_numpy() == ci
        if not ma.any() or ma.all():
            return empty
        G = (V[ma] @ V[~ma].T) / np.outer(norms[ma], norms[~ma])
        xi, yi = np.nonzero(G >= threshold)
        if not len(xi):
            return empty
        return _emit(ids[ma][xi], ids[~ma][yi], G[xi, yi])

    v = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    banded = v.mapInPandas(
        bucketize, "id long, vec array<double>, norm double, buckets array<long>"
    ).select("id", "vec", "norm", F.posexplode("buckets").alias("tbl", "bucket"))
    if max_group_size is None:
        confirmed = banded.groupBy("tbl", "bucket").applyInPandas(
            confirm_group, "a_id long, b_id long, cosine double"
        )
    else:
        from .similarity import _chunk_pairs

        chunked = _chunk_pairs(banded, ["tbl", "bucket"], max_group_size)
        confirmed = chunked.groupBy("tbl", "bucket", "ci", "cj").applyInPandas(
            confirm_chunk_pair, "a_id long, b_id long, cosine double"
        )
    # a pair colliding in several tables is confirmed in each: dedup. max()
    # collapses the ulp-level spread between per-group BLAS evaluations of
    # the same dot product deterministically.
    return confirmed.groupBy("a_id", "b_id").agg(F.max("cosine").alias("cosine"))


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    impl: str = "packed",
) -> DataFrame:
    """(doc_id, simhash bigint): bit b of the hash is 1 iff the majority of
    the doc's distinct tokens have bit b set in their portable hash.
    Uses the 60-bit portable hash (bits 0..59) so the DuckDB oracle matches
    exactly. Both impls produce identical rows (tested).

    impl='packed' (default): ONE groupBy(doc) with 60 set-bit-count partial
    aggregations + a token count; bit b of the result is 1 iff
    2*count_set > n_tokens (same majority as the ±1 vote sum). No row
    amplification at all — the r2 version exploded 60 rows per distinct
    token, a 60x CPU tax on the biggest input column even though map-side
    combine bounded the shuffle.

    impl='explode': the original two-shuffle bit-explode algebra, kept as
    the parity twin for the row-identical test.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).filter(F.col("tok") != "")
    hashed = toks.select("doc_id", portable_hash64(F.col("tok")).alias("h"))
    if impl == "packed":
        counts = [
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"c{b}")
            for b in range(60)
        ]
        agg = hashed.groupBy("doc_id").agg(F.count("*").alias("n"), *counts)
        total = F.lit(0).cast("long")
        for b in range(60):
            total = total + F.when(
                F.col(f"c{b}") * 2 > F.col("n"), F.lit(1 << b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return agg.select("doc_id", total.alias("simhash"))
    bits = hashed.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
    ).select(
        "doc_id",
        "bit",
        # vote +1 if bit set else -1 (column-valued shift needs expr form)
        (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
    )
    votes = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def canonical_url(col):
    """URL canonicalization Column: the dedup key a crawl pipeline groups
    on. Scheme and host lowercase, default :80/:443 ports dropped, query
    string and fragment dropped entirely (the aggressive-but-standard crawl
    dedup choice — tracking params make byte-level URL dedup useless),
    trailing slash stripped. Pure regexp Column algebra, portable between
    Spark's Java regex and the DuckDB oracle's RE2 (no lookaround)."""
    no_q = F.regexp_replace(col, r"[?#].*$", "")
    scheme = F.lower(F.regexp_extract(no_q, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(no_q, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    path = F.regexp_extract(no_q, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$", 1)
    # strip ALL trailing slashes: '//' must reach '' in one pass, or the
    # canonical form isn't a fixed point (caught by the Hypothesis
    # idempotence property — one-slash stripping left 'http://h//' at
    # 'http://h/' whose re-canonicalization differed)
    norm_path = F.regexp_replace(path, r"/+$", "")
    return F.concat(scheme, F.lit("://"), host, norm_path)


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Exact URL-level dedup after canonicalization: one row per canonical
    URL with the min doc id as canonical and the duplicate count — the
    first dedup stage of every crawl pipeline (two fetches of
    `HTTP://Site.com/a?utm_source=x#top` and `http://site.com/a/` are the
    same page). Same groupBy shape (and scale story) as exact_dedup."""
    return (
        df.select(F.col(id_col).alias("doc_id"), canonical_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
    )


def span_occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", span_len: int = 8
) -> DataFrame:
    """(doc_id, pos, span): EVERY token window of length ``span_len`` at
    every start position — unlike ``shingles`` nothing is deduplicated,
    because substring-level dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better") cares about total duplicated text, and a
    span repeated within one document is still duplication. Native column
    algebra (split + posexplode), no Python."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        gram_index(toks, span_len),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, span_len)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(grams).alias("pos", "span")
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide repeated substrings: (span, n_docs, n_occurrences) for
    every ``span_len``-token window occurring at least ``min_count`` times
    anywhere — the distributed stand-in for the suffix-array substring-dedup
    pass (a suffix array finds arbitrary-length repeats; fixed-length span
    hashing finds every repeat of >= span_len tokens, since any such repeat
    contains a repeated span, at shuffle-key cost instead of global sort).

    Plan: one explode -> groupBy(span) with map-side combine (the shuffle
    carries distinct spans per partition, not occurrences) -> HAVING filter.
    Skew: a boilerplate span is exactly what this finds — the aggregate is
    a counter, never a list, so a hot span costs one combiner cell."""
    occ = span_occurrences(docs, id_col, text_col, span_len)
    return (
        occ.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def span_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document cross-corpus duplication signal: (doc_id, n_spans,
    n_repeated, dup_frac) where n_repeated counts this doc's span positions
    whose span occurs >= min_count times CORPUS-WIDE — the actionable
    complement of ``textstats.repetition_stats`` (which only sees
    within-doc repetition). dup_frac ~ 1 means the document is assembled
    from text that exists elsewhere; the standard cut drops or trims those.
    Docs shorter than ``span_len`` tokens have no spans and emit no row.

    Plan: the occurrence table is built once per side of a self-agg join on
    span (shuffle key = span text, the same well-distributed key as the
    shingle joins; the hot-span aggregate is a counter, so boilerplate
    inflates one cell, not a group list)."""
    occ = span_occurrences(docs, id_col, text_col, span_len)
    rep = (
        occ.groupBy("span")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("span")
    )
    flagged = occ.join(rep, "span", "left_semi")
    per_doc = occ.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    per_rep = flagged.groupBy("doc_id").agg(F.count("*").alias("n_repeated"))
    return (
        per_doc.join(per_rep, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_repeated", F.lit(0)).alias("n_repeated"),
            F.round(
                F.coalesce("n_repeated", F.lit(0)).cast("double") / F.col("n_spans"), 6
            ).alias("dup_frac"),
        )
    )


def repeated_runs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal repeated runs per document: (doc_id, start_token, end_token,
    n_tokens) where [start_token, end_token) is a MAXIMAL token interval
    covered by corpus-repeated ``span_len``-windows — the variable-length
    extension of ``repeated_spans`` (r5, VERDICT r4 #4). A 100-token
    boilerplate block repeated across docs shows up as ONE run of ~100
    tokens, not 93 overlapping 8-token rows, which is what a cutter needs
    (suffix-array substring dedup intent, Lee et al. 2022; reference analog:
    the containment filters behind MakeTrainingSet.groovy's dedup intent).

    Interval algebra: windows at positions p < q overlap-or-adjoin in token
    space iff q - p <= span_len, so a NEW run starts when the gap exceeds
    span_len; run ids are a running sum of new-run flags (gaps-and-islands).
    The window is partitioned by doc_id — per-doc sequential scan, no
    SinglePartition — and the repeated-span semi-join shuffles on span text,
    the same well-distributed key as every shingle stage."""
    occ = span_occurrences(docs, id_col, text_col, span_len)
    rep = (
        occ.groupBy("span")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("span")
    )
    flagged = occ.join(rep, "span", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    new_run = F.when(
        F.col("pos") - F.lag("pos").over(w) > span_len, F.lit(1)
    ).otherwise(F.lit(0))
    run_id = F.sum(new_run).over(
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("_run", run_id)
        .groupBy("doc_id", "_run")
        .agg(
            F.min("pos").cast("long").alias("start_token"),
            (F.max("pos") + span_len).cast("long").alias("end_token"),
        )
        .select(
            "doc_id",
            "start_token",
            "end_token",
            (F.col("end_token") - F.col("start_token")).alias("n_tokens"),
        )
    )


def cut_repeated_runs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Cut every repeated run out of the text: (doc_id, clean_text,
    n_tokens_cut). The aggressive per-doc cut (ALL copies lose the
    duplicated tokens) — deterministic and order-free, unlike keep-one-copy
    which needs a global owner election per run; compose with
    ``neardup_text_clusters`` when one canonical copy should survive.

    Plan: runs collapse to one array per doc (collect_list bounded by
    runs-per-doc, intervals are disjoint by construction), ONE join back to
    the docs, then pure column algebra — F.filter's (element, index) lambda
    keeps tokens outside every cut interval; no Python UDF."""
    runs = repeated_runs(docs, id_col, text_col, span_len, min_count)
    per_doc = runs.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_token", "end_token")).alias("_runs")
    )
    joined = docs.join(
        per_doc, docs[id_col] == per_doc.doc_id, "left"
    ).drop(per_doc.doc_id)
    toks = F.split(F.col(text_col), " ")
    covered = lambda i: F.exists(
        F.col("_runs"),
        lambda r: (i >= r["start_token"]) & (i < r["end_token"]),
    )
    kept = F.when(F.col("_runs").isNull(), toks).otherwise(
        F.filter(toks, lambda t, i: ~covered(i))
    )
    return joined.select(
        F.col(id_col).alias("doc_id"),
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_tokens_cut"),
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    impl: str = "packed",
    materialize: bool = True,
) -> DataFrame:
    """SimHash near-duplicate pairs: (a_id, b_id, hamming) for every doc
    pair whose 60-bit simhashes differ in <= ``max_hamming`` bits —
    completing the SimHash family (``simhash64`` computes signatures; this
    finds the pairs, the way Manku/Jain/Sarma's web-crawl dedup does).

    Candidates by banding: the signature splits into ``bands`` exact-match
    bands (60/bands bits each); docs colliding on ANY band are candidates,
    then one bit_count(XOR) confirms. For max_hamming < bands the pigeonhole
    principle makes recall EXACTLY 1 (d differing bits cannot touch all
    ``bands`` bands), so the output equals the brute-force all-pairs scan —
    which is what the DuckDB oracle runs. Work ∝ band-bucket collisions
    (shuffle key = 15-bit band value, well-distributed by the hash), never
    the n² scan. ``materialize`` persists the signature table, which both
    join sides reference (Catalyst won't CSE the 61-aggregate groupBy)."""
    sig = simhash64(docs, id_col, text_col, impl=impl)
    if materialize:
        from pyspark.storagelevel import StorageLevel

        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    # expand_partitions=0: the persisted signature table is known-small and
    # simhash signatures are mostly unique, so the banded expansion is
    # ~linear — the widening repartition measured as pure latency here
    # (interleaved A/B 2.10s vs 2.28s); dup-heavy callers (image aHash)
    # keep the default widening.
    return hamming_pairs(
        sig, id_col="doc_id", sig_col="simhash", n_bits=60,
        max_hamming=max_hamming, bands=bands, expand_partitions=0,
    )


def hamming_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    n_bits: int = 64,
    max_hamming: int = 3,
    bands: int = 4,
    expand_partitions: int | None = None,
) -> DataFrame:
    """(a_id, b_id, hamming) for every pair of integer signatures differing
    in <= ``max_hamming`` of the low ``n_bits`` bits — the banding + XOR
    confirm shared by text SimHash (`simhash_pairs`) and perceptual image
    hashes (`multimodal.image_ahash`). Candidates collide on at least one
    of ``bands`` exact-match bands (n_bits/bands bits each); for
    max_hamming < bands the pigeonhole principle makes recall EXACTLY 1,
    so the output equals the brute-force all-pairs scan (which is what the
    DuckDB oracles run). Work ∝ band-bucket collisions, never n²."""
    assert max_hamming < bands, "pigeonhole recall guarantee needs d < bands"
    assert n_bits % bands == 0, "bands must divide n_bits"
    bits = n_bits // bands
    mask = (1 << bits) - 1
    banded = sigs.select(
        F.col(id_col).alias("doc_id"),
        F.col(sig_col).alias("_sig"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(sig_col), b * bits)
                    .bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    # explicit width (r6): the banded table is tiny in BYTES while the
    # bucket self-join's OUTPUT is quadratic per bucket, so AQE's
    # size-based planning would coalesce the expansion into one or two
    # tasks when the signature table is cached/known-small. A user
    # repartition is exempt from coalescing and matches the join keys, so
    # both sides reuse this exchange. ``expand_partitions``: None (default)
    # widens to defaultParallelism — right whenever duplication is heavy
    # (identical signatures expand quadratically per bucket, the aHash
    # case); 0 skips the repartition — measured better for mostly-unique
    # signature sets (text SimHash at sf0.1: 2.10s vs 2.28s) where the
    # expansion is ~linear and the extra exchange is pure latency.
    if expand_partitions != 0:
        banded = banded.repartition(
            expand_partitions
            or sigs.sparkSession.sparkContext.defaultParallelism,
            "band", "bucket",
        )
    a = banded.select(
        F.col("doc_id").alias("a_id"), F.col("_sig").alias("_sa"),
        "band", "bucket",
    )
    b = banded.select(
        F.col("doc_id").alias("b_id"), F.col("_sig").alias("_sb"),
        "band", "bucket",
    )
    # FIRST-SHARED-BAND dedup (r6): a pair of identical-or-near signatures
    # collides in MANY bands (an exact duplicate collides in all of them),
    # and the old .distinct() shuffled that multiplied stream. Band j
    # collides iff the XOR's j-th band is zero — derivable from the carried
    # signatures with pure bit ops — so keeping only the LOWEST colliding
    # band is a narrow in-stage filter and the exchange disappears. The
    # kept set is exactly the old distinct set (the join key guarantees at
    # least one colliding band per candidate row). Deliberately SCALAR
    # arithmetic, not transform/exists: higher-order functions run
    # interpreted per row, which at candidate-stream volume costs more
    # than the shuffle they replace (measured 28s vs 2s on the bar-image
    # bench); a sum of CASE terms stays inside whole-stage codegen.
    z_terms = []
    for j in range(bands):
        m = mask << (j * bits)
        if m >= 1 << 63:
            m -= 1 << 64  # literal must be a signed 64-bit value in SQL
        z_terms.append(
            f"(CASE WHEN ((_sa ^ _sb) & {m}L) = 0 THEN {1 << j}L ELSE 0L END)"
        )
    no_earlier_band = (
        f"((({' + '.join(z_terms)}) & (shiftleft(1L, band) - 1)) = 0)"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.expr(no_earlier_band))
        .select("a_id", "b_id", "_sa", "_sb")
    )
    return cand.select(
        "a_id",
        "b_id",
        F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def minhash_jaccard_estimate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(a_id, b_id, est_jaccard) for LSH candidate pairs: the MinHash
    sketch's similarity SIGNAL — fraction of agreeing signature slots. The
    cheap middle tier between raw candidates and the exact shingle-join
    confirm of ``neardup_text_scalable``: rank or pre-filter candidates on
    the estimate (zero additional corpus access — the signatures already
    exist) and reserve the exact confirm for the survivors. Pure column
    algebra: candidate equi-join on (band, bucket), then one zip_with over
    the two signature arrays.

    Calibration caveat (measured, tested): this module's permutations are
    the affine family g_i = (h1 + i·h2) from ONE md5 per shingle, so slots
    are CORRELATED — the textbook "agreement fraction is unbiased for
    Jaccard" only holds for independent permutations. In practice the
    estimate is accurate for similar pairs (MAE ~0.10 at exact >= 0.4 on
    the fixture corpus, 16 slots) and upward-biased for dissimilar ones —
    monotone enough to RANK candidates (tested), not to report as a
    calibrated Jaccard. For calibrated estimates pay num_hashes independent
    md5s per shingle; for exact values run the confirm stage."""
    from pyspark.storagelevel import StorageLevel

    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, n, num_hashes, shingles_df)
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)  # both join sides
    banded = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col("sig")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("_sa"), "band", "bucket"
    )
    b = banded.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("_sb"), "band", "bucket"
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "_sa", "_sb")
        .distinct()
        .select(
            "a_id",
            "b_id",
            F.round(agree.cast("double") / num_hashes, 6).alias("est_jaccard"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    ``n``-token window with an evaluation/benchmark corpus — the GPT-3
    Appendix-C / Pile-style n-gram overlap filter every released training
    set runs before the eval table means anything. One row per training
    doc: (doc_id, n_grams, n_contaminated, contam_frac, contaminated)
    where n_contaminated counts this doc's window POSITIONS whose n-gram
    occurs anywhere in the eval corpus and contaminated = n_contaminated
    >= min_hits. Docs shorter than ``n`` tokens have no windows and report
    n_grams = 0, contaminated only if min_hits == 0 is never the case
    (min_hits >= 1), i.e. false.

    Scale plan: the eval corpus is tiny next to the training corpus
    (benchmarks are MBs against 100 TB), so its DISTINCT n-gram set is
    built once and BROADCAST — the training side is one narrow
    split/explode_outer (gram-less docs emit one NULL-span row, so every
    doc reaches the output without a join back to the base table) into a
    broadcast LEFT join that marks hits, then ONE groupBy(doc_id) counts
    grams and hits together. Exactly one exchange in the whole plan (the
    per-doc agg on a unique key, map-side partials); no SortMergeJoin
    anywhere; nothing depends on eval x train pairing."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        gram_index(toks, n), lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    occ = docs.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(grams).alias("span")
    )
    ev = (
        span_occurrences(eval_docs, eval_id_col, eval_text_col, n)
        .select("span")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    marked = occ.join(F.broadcast(ev), "span", "left")
    agg = marked.groupBy("doc_id").agg(
        F.count("span").alias("n_grams"),
        F.count("_hit").alias("n_contaminated"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round(
            F.col("n_contaminated").cast("double")
            / F.greatest(F.col("n_grams"), F.lit(1)),
            6,
        ).alias("contam_frac"),
        (F.col("n_contaminated") >= min_hits).alias("contaminated"),
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_group_size: int | None = 4096,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine pruning —
    the embedding-space complement of the LSH near-dup path, and the shape
    that scales when you already maintain a trained coarse quantizer
    (``similarity.train_centroids``). A vector is DROPPED iff some
    lower-id vector in the SAME cell has ROUND(cosine, 6) >= threshold
    (the paper keeps one representative per semantic-duplicate group; we
    pin the deterministic lowest-id-wins order so two engines agree
    row-for-row). One row per vector: (vec_id, cell, keep).

    Scale plan: assignment is ONE narrow mapInPandas matmul against the
    broadcast centroid matrix (similarity.ivf_assign) — no shuffle; the
    pairwise check happens INSIDE each cell group (applyInPandas, one
    V @ V.T per cell), so work is ∝ Σ_cell |cell|² — bounded by the
    quantizer's balance, never corpus-quadratic, and a residual mega cell
    (duplicates cluster together BY DESIGN) splits into chunk-pair groups
    of <= 2*max_group_size rows (similarity._chunk_pairs) with verdicts
    OR-merged per vector, so per-task memory stays bounded and each pair
    is still checked exactly once. Cosines are rounded to 6 decimals
    BEFORE the threshold compare so a last-ulp BLAS-vs-fold difference
    cannot flip a keep decision (the module-wide oracle convention)."""
    import numpy as np
    import pandas as pd

    from .similarity import _chunk_pairs, ivf_assign

    assigned = ivf_assign(
        embeddings, centroids, id_col=id_col, vec_col=vec_col, impl="numpy"
    )

    empty = pd.DataFrame({"id": pd.Series([], dtype="int64")})

    def _dropped(ids_a, ids_b, G):
        """ids of b-side vectors with an a-side neighbor of smaller id and
        rounded cosine >= threshold."""
        hit = (np.round(G, 6) >= threshold) & (
            ids_a[:, None] < ids_b[None, :]
        )
        out = np.unique(ids_b[hit.any(axis=0)])
        return pd.DataFrame({"id": out}) if len(out) else empty

    def drop_in_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n <= 1:
            return empty
        ids = pdf["id"].to_numpy(dtype="int64")
        V = np.vstack(pdf["vec"].to_numpy())
        norms = pdf["norm"].to_numpy(dtype="float64")
        G = (V @ V.T) / np.outer(norms, norms)
        return _dropped(ids, ids, G)

    def drop_in_chunk_pair(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n <= 1:
            return empty
        ci, cj = int(pdf["ci"].iat[0]), int(pdf["cj"].iat[0])
        ids = pdf["id"].to_numpy(dtype="int64")
        V = np.vstack(pdf["vec"].to_numpy())
        norms = pdf["norm"].to_numpy(dtype="float64")
        if ci == cj:
            G = (V @ V.T) / np.outer(norms, norms)
            return _dropped(ids, ids, G)
        ma = pdf["_c"].to_numpy() == ci
        if not ma.any() or ma.all():
            return empty
        G = (V[ma] @ V[~ma].T) / np.outer(norms[ma], norms[~ma])
        # cross block: smaller-id may sit on either side
        d1 = _dropped(ids[ma], ids[~ma], G)
        d2 = _dropped(ids[~ma], ids[ma], G.T)
        return pd.concat([d1, d2], ignore_index=True)

    if max_group_size is None:
        dropped = assigned.groupBy("cell").applyInPandas(
            drop_in_cell, "id long"
        )
    else:
        chunked = _chunk_pairs(assigned, ["cell"], max_group_size)
        dropped = chunked.groupBy("cell", "ci", "cj").applyInPandas(
            drop_in_chunk_pair, "id long"
        )
    dropped = dropped.distinct()
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            "cell",
            F.col("_drop").isNull().alias("keep"),
        )
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide line-grain exact dedup — the RefinedWeb/CCNet boilerplate
    remover (Penedo et al. 2023 §4.2 "line-wise corrections"; CCNet's
    paragraph-hash dedup): a line whose normalized form (trim + lowercase)
    appears in >= ``min_docs`` DISTINCT documents is navigation/footer/cookie
    boilerplate, and every occurrence is removed from every document.
    Returns (doc_id, n_lines, n_removed, text) with the surviving lines
    rejoined by ``line_sep`` in original order; lines that normalize to ''
    are dropped from both counting and output (they carry no content).

    Document-grain dedup (exact_dedup/minhash) misses this entirely: two
    pages sharing a 40-line nav bar but different articles are NOT near-dups,
    yet 40 of their lines are pure duplication. Reference analog: the
    boilerplate intent behind the HTML cleanup in Dermo2Monarch.groovy's
    extract chain (our extract.py strips tags; this strips repeated text).

    Scale shape (100 TB): the df count is groupBy(key, doc)-distinct FIRST —
    (key, doc_id) hashes spread a hot boilerplate line ("accept cookies")
    across all partitions — then a bounded map-side-combinable count per key,
    so no single reducer ever sees a hot line's full occurrence list. The
    flag join keys occurrences on the line hash; the common-line side is one
    row per distinct repeated line (AQE handles the occurrence-side skew).
    Rebuild is one groupBy(doc_id) — unique key, no skew. Zero Python UDFs.
    """
    return apply_line_cut(
        docs,
        common_lines(docs, id_col, text_col, line_sep, min_docs),
        id_col=id_col,
        text_col=text_col,
        line_sep=line_sep,
        # corpus-derived common set: size is bounded only by distinct
        # repeated lines (can outgrow a broadcast at 100 TB) -> shuffle join
        broadcast=False,
    )


def _line_occurrences(
    docs: DataFrame, id_col: str, text_col: str, line_sep: str
) -> DataFrame:
    """(doc_id, pos, line, key): one row per non-blank line with its
    original position and normalized (lower+trim) form — the shared base
    of detection (`common_lines`) and cutting (`apply_line_cut`)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), line_sep)).alias("pos", "line"),
        )
        .withColumn("key", F.lower(F.trim(F.col("line"))))
        .filter(F.col("key") != "")
    )


def common_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """(line_key): every normalized line form in >= ``min_docs`` DISTINCT
    documents — the detection half of line dedup, also the batch twin of
    `streaming/boilerplate_stream.streaming_common_lines`. The df count is
    groupBy(key, doc)-distinct FIRST — (key, doc_id) hashes spread a hot
    boilerplate line across all partitions — then a map-side-combinable
    count per key, so no single reducer ever sees a hot line's full
    occurrence list."""
    return (
        _line_occurrences(docs, id_col, text_col, line_sep)
        .select("key", "doc_id")
        .distinct()
        .groupBy("key")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select(F.col("key").alias("line_key"))
    )


def apply_line_cut(
    docs: DataFrame,
    common_lines: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    key_col: str = "line_key",
    broadcast: bool = True,
) -> DataFrame:
    """The CUT half of line dedup, decoupled from detection: strip every
    line whose normalized form appears in ``common_lines`` (one ``key_col``
    row per boilerplate line — the `common_lines` detector's output, or
    the emitted table of
    `streaming/boilerplate_stream.streaming_common_lines`). Output:
    (doc_id, n_lines, n_removed, text), survivors rejoined in original
    order, whitespace-only lines dropped from counting and output.
    `line_dedup` IS common_lines + this function — one rebuild code path.

    Detect-once / cut-many is the operational shape at crawl scale: the
    common-line set is a deploy artifact (refreshed daily by the stream or
    a batch scan), and each ingest batch pays ONE hash join against it
    (``broadcast=True``, the default, for MB-scale artifacts; line_dedup
    passes False because its corpus-derived set is bounded only by
    distinct repeated lines) plus the unique-key per-doc rebuild; the
    corpus-wide distinct/count stage is not re-run per batch. Zero
    Python UDFs."""
    occ = _line_occurrences(docs, id_col, text_col, line_sep)
    common = common_lines.select(F.col(key_col).alias("key")).distinct()
    if broadcast:
        common = F.broadcast(common)
    common = common.withColumn("_common", F.lit(True))
    return (
        occ.join(common, "key", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("_common"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_common").isNull(),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
                line_sep,
            ).alias("text"),
        )
        .select("doc_id", "n_lines", "n_removed", "text")
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    threshold: float = 0.95,
    impl: str = "numpy",
) -> DataFrame:
    """(vec_id, max_sim, contaminated) — embedding-grain benchmark
    decontamination: flag every corpus item whose embedding cosine to ANY
    eval/benchmark embedding reaches ``threshold``. The semantic
    complement of the n-gram `decontaminate` (paraphrased benchmark
    leakage shares no 8-token window but does share an embedding
    neighborhood — the FineWeb-era check).

    Cross-engine exactness: each pairwise cosine is ROUND(6) BEFORE the
    per-item max on both engines, the module's ANN recipe.

    impl='numpy' (default, the scale path): the eval matrix is a deploy
    artifact (benchmarks are MBs) collected once and closed over ONE
    mapInPandas — per corpus Arrow batch a single (b × m) matmul and a
    row max; the 100 TB side is ONE pass, no shuffle at all (the output
    is per-item, no aggregation needed). impl='sql': broadcast eval cross
    join + groupBy(id) max — the JVM-only twin the parity test pins."""
    if impl == "numpy":
        import numpy as np
        import pandas as pd

        erows = (
            eval_vecs.select(
                F.col(id_col).cast("long").alias("id"),
                F.col(vec_col).cast("array<double>").alias("vec"),
            )
            .orderBy("id")
            .collect()
        )
        E = [list(r["vec"]) for r in erows]

        def part(batches):
            Em = np.asarray(E, dtype="float64")
            en = np.sqrt((Em * Em).sum(axis=1))
            en[en == 0.0] = 1.0
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.vstack(pdf["vec"].to_numpy())
                vn = np.sqrt((V * V).sum(axis=1))
                vn[vn == 0.0] = 1.0
                if len(Em):
                    S = np.round((V @ Em.T) / np.outer(vn, en), 6)
                    mx = S.max(axis=1)
                else:
                    mx = np.full(len(V), float("-inf"))
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["id"].astype("int64"),
                        "max_sim": mx,
                        "contaminated": mx >= threshold,
                    }
                )

        return corpus.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        ).mapInPandas(part, "vec_id long, max_sim double, contaminated boolean")

    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda a: F.sqrt(dot(a, a))
    c = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    e = F.broadcast(
        eval_vecs.select(F.col(vec_col).cast("array<double>").alias("e"))
    )
    sims = c.crossJoin(e).select(
        "vec_id",
        F.round(
            dot(F.col("v"), F.col("e")) / (norm(F.col("v")) * norm(F.col("e"))), 6
        ).alias("c"),
    )
    return sims.groupBy("vec_id").agg(
        F.max("c").alias("max_sim"),
        (F.max("c") >= F.lit(threshold)).alias("contaminated"),
    )
