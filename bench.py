"""Benchmark harness (driver contract + north-rule scaling evidence).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], then runs the full KG pipeline
(extract -> NER -> pair counting -> scoring) on a deterministic synthetic
web-page corpus at TWO parallelism levels (cores and cores/4) to evidence the
N -> 4N scaling-efficiency criterion of BASELINE.json in this sandbox.

Prints ONE JSON line:
  {"metric": "total_runtime_sec", "value": <sum of query secs>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "pipeline": {throughput + scaling}}

Also refreshes BENCH/BASELINE.md with the measured scaling table.
"""

from __future__ import annotations

import json
import os
import time

N_BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "60000"))

BENCH_QUERIES = [
    "kg_triples_scored",
    "kg_pair_counts",
    "kg_closure_docfreq",
    "kg_topk_pairs",
    "kg_connected_components",
    "kg_sent_pairs",
    "dd_exact_dedup",
    "dd_minhash",
    "dd_minhash_lsh_pairs",
    "dd_text_neardup_scalable",
    "dd_simhash",
    "dd_embedding_neardup_scalable",
    "sim_ivf_topk",
    "sim_lsh_topk",
    "ts_token_count",
    "ts_quality",
    "ts_lang_id",
    "ts_fingerprint",
    "ts_repetition",
    "ts_top_ngrams",
    "ts_pii_redact",
    "ts_vocab_encode",
    "dd_text_neardup_clusters",
    "mm_audio_features",
    "mm_video_frames",
    "link_scores",
    "sim_cosine_topk",
    "kg_cutoff_auc",
    "mm_image_features",
    "ev_daily_counts",
    "ev_topk_users",
    "tpch_pricing_summary",
    "tpch_join_agg",
    # new in r4
    "ts_pack_sequences",
    "ts_stratified_sample",
    "dd_url_dedup",
    "dd_repeated_spans",
    "dd_span_dup_stats",
    "link_bm25",
    "kg_degree",
    "kg_triangles",
    "ts_keep_filter",
    "ts_unigram_logppl",
    "dd_simhash_pairs",
    "ev_sessionize",
    "ev_asof_prior",
    "ev_range_join",
    "ev_rollup_multigrain",
    # new in r5
    "dd_repeated_runs",
    "dd_cut_runs",
    "ts_length_quantiles",
    "sim_ivf_trained",
    "kg_pagerank2",
    "dd_decontaminate",
    "dd_semdedup",
    "ts_shuffle_order",
    "bpe_top_pairs",
    "ts_shard_manifest",
    "cls_nb_quality",
    "ts_temperature_mix",
    "ts_bigram_logppl",
    "sim_pq_adc",
    "sim_ivfpq",
    "ts_dataset_split",
    "sim_pq_trained",
    "dd_incremental_neardup",
    "src_warc_roundtrip",
    "src_warc_sink",
    "dd_line_dedup",
    "ts_dsir_weights",
    "kg_host_graph",
    "kg_host_rank",
    "link_anchor_entities",
    "kg_host_harmonic",
    "dd_semantic_decontam",
    "mm_image_ahash",
    "dd_image_ahash_pairs",
]


def _run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warmup: pay JVM/Arrow/python-worker startup outside the timed window
    qs["kg_mentions_docfreq"](spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # operators that persist internal stages (text near-dup shingles,
        # confirmed-pair edges) would otherwise hand a warm cache to the next
        # query with the same logical subtree — each wall below must price
        # the query's own materialization, not a neighbor's leftovers
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    return out


def _author_skew_probe(spark) -> float:
    """Author canonicalization under a planted mega-key: one 'j smith'
    author_key with 10k records (10x OVER the max_group_size=1000 cap) next
    to 2000 well-behaved 5-record keys. Uncapped, the mega-key alone would
    be ~50M within-group pair scores; the r5 blocking path sub-keys it by
    coauthor MinHash into 32 blocks of ~312 records, so it pays ~1.5M
    blocked pair scores and RECOVERS the 32 coauthor sub-entities instead
    of dropping the key (r4 behavior: 10k silent singletons). Returns the
    wall; asserts the recovered entity structure so a silently-broken
    blocking path can't post a fast-but-wrong number."""
    from pyspark.sql import functions as F

    from pmcanalysis_spark.canonicalize import canonicalize_authors

    mega = spark.range(10_000).select(
        F.concat(F.lit("m"), F.col("id")).alias("doc_id"),
        F.lit("j smith").alias("author_key"),
        F.array(F.concat(F.lit("co"), F.pmod("id", F.lit(32)))).alias("coauthors"),
        F.array(F.lit("oncology"), F.concat(F.lit("mesh"), F.pmod("id", F.lit(5)))).alias("mesh"),
        F.split(F.lit("deep sequencing of tumor samples"), " ").alias("title_tokens"),
        F.split(F.concat(F.lit("dept "), F.pmod("id", F.lit(3))), " ").alias("affiliation_tokens"),
    )
    normal = spark.range(10_000).select(
        F.concat(F.lit("n"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("author_"), (F.col("id") / 5).cast("long")).alias("author_key"),
        F.array(F.concat(F.lit("co"), (F.col("id") / 5).cast("long"))).alias("coauthors"),
        F.array(F.concat(F.lit("mesh"), (F.col("id") / 5).cast("long"))).alias("mesh"),
        F.split(F.lit("a perfectly ordinary paper title"), " ").alias("title_tokens"),
        F.split(F.lit("small lab"), " ").alias("affiliation_tokens"),
    )
    records = mega.unionByName(normal).repartition(64)
    t0 = time.perf_counter()
    out = canonicalize_authors(records, max_group_size=1000)
    agg = out.groupBy("author_key").agg(
        F.countDistinct("entity_id").alias("n_entities"),
        F.count("*").alias("n_docs"),
    )
    rows = {r["author_key"]: (r["n_entities"], r["n_docs"]) for r in agg.collect()}
    wall = time.perf_counter() - t0
    # mega key blocked (not dropped): the 32 coauthor sub-entities are
    # recovered, and no record vanished
    assert rows["j smith"] == (32, 10_000)
    # each 5-record key shares identical features -> one entity
    assert rows["author_0"] == (1, 5) and len(rows) == 2001
    return wall


def _pair_counts_skew_probe(spark) -> dict[str, float]:
    """Flagship J4 under a planted head term (VERDICT r4 #6): one
    'disease'-grade DS term touching 30% of 50k docs next to 20 OP and 100
    tail-DS terms — the (OP:x, DS:head) aggregate groups carry ~100x the
    tail groups' counts. Times pair_counts with salt_buckets in {0, 8, 32}
    (best-of-2 each, interleaved) and asserts all three produce identical
    aggregates, so the parity-proven salted path finally gets a measured
    skew number instead of a theoretical one. The join key itself (doc_id)
    stays uniform — AQE's skew-join splitter never triggers here; what the
    salt can help is the AGGREGATE, which hash-aggregate partial combine
    already absorbs map-side. The recorded walls settle whether the salt
    pays at all (PLANS.md 'Skewed head term' paragraph)."""
    from pyspark.sql import functions as F

    from pmcanalysis_spark.operators.cooccur import pair_counts

    n_docs = 50_000
    docs = spark.range(n_docs)
    op = docs.select(
        "id",
        F.explode(
            F.array(*[
                F.concat(F.lit("OP:"), F.pmod(F.col("id") * (7 + i) + i, F.lit(20)))
                for i in range(8)
            ])
        ).alias("term_id"),
    )
    ds_tail = docs.select(
        "id",
        F.explode(
            F.array(*[
                F.concat(F.lit("DS:t"), F.pmod(F.col("id") * (13 + i) + i, F.lit(100)))
                for i in range(3)
            ])
        ).alias("term_id"),
    )
    ds_head = docs.filter(F.pmod("id", F.lit(10)) < 3).select(
        "id", F.lit("DS:head").alias("term_id")
    )
    dt = (
        op.unionByName(ds_tail).unionByName(ds_head)
        .select(F.col("id").cast("string").alias("doc_id"), "term_id")
        .distinct()
        .persist()
    )
    dt.count()  # same warmed input for every salt variant

    def run(salt: int) -> tuple[float, int, int]:
        t0 = time.perf_counter()
        agg = pair_counts(dt, "OP:", "DS:", salt_buckets=salt).agg(
            F.count("*").alias("groups"), F.sum("nab").alias("total")
        ).collect()[0]
        return time.perf_counter() - t0, agg["groups"], agg["total"]

    salts = (0, 8, 32)
    walls: dict[int, float] = {}
    ref = None
    for _rep in range(2):
        for s in salts:  # interleaved: drift hits all variants equally
            w, groups, total = run(s)
            walls[s] = min(walls.get(s, w), w)
            if ref is None:
                ref = (groups, total)
            assert (groups, total) == ref, (
                f"salted aggregate diverged at salt={s}: {(groups, total)} vs {ref}"
            )
    dt.unpersist()
    return {f"kg_pair_counts_skew_salt{s}": round(walls[s], 3) for s in salts}


def _prewarm(spark) -> None:
    """Pay one-time costs (python worker fork + pandas/pyarrow imports, JVM
    codegen) outside the timed window — steady-state throughput is the
    honest metric; long-lived executors amortize these on a real cluster."""
    import pandas as pd
    from pyspark.sql import functions as F

    def ident(batches):
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"]})

    spark.range(256).repartition(128).mapInPandas(ident, "id long").count()
    spark.range(100000).select(F.md5(F.col("id").cast("string"))).distinct().count()


def _write_bench_corpus(n_pages: int, sentences_per_page: int, path: str) -> None:
    """Generate the deterministic corpus ONCE to parquet (64 files) so every
    measured session reads identical splits from (OS-cached) storage."""
    from pmcanalysis_spark.fixtures import bench_pages_df
    from pmcanalysis_spark.session import get_spark

    spark = get_spark(app_name="bench-gen", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    try:
        bench_pages_df(spark, n_pages, sentences_per_page, partitions=64).write.mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.stop()


def _run_pipeline(cores: int, corpus_path: str) -> tuple[float, int]:
    """Steady-state wall of the full KG pipeline at a given parallelism.

    Fresh SparkSession bound to local[cores]; identical 64-split parquet
    input for every level — the sandbox stand-in for N vs 4N executors.
    The reported wall is the BEST of ``inner`` back-to-back in-session
    executions (each one a freshly built plan — rebuilding build_triples
    produces new RDD lineage, so shuffle outputs are NOT reused and every
    execution recomputes the whole job): the first execution of a fresh
    JVM pays codegen/allocator/page-cache bring-up that belongs to session
    startup, not to the engine's throughput at this parallelism, and that
    noise was large enough to swing drift-matched pair ratios 0.66-0.92 on
    identical code. Callers additionally interleave (rep x level) so the
    multi-minute machine drift hits all levels alike.
    """
    from pmcanalysis_spark.fixtures import build_hierarchy_terms, build_lexicon
    from pmcanalysis_spark.pipeline import PipelineConfig, build_triples
    from pmcanalysis_spark.schemas import HIERARCHY
    from pmcanalysis_spark.session import get_spark

    inner = int(os.environ.get("SPARK_GRAFT_BENCH_INNER", "2"))
    spark = get_spark(app_name=f"bench-local{cores}", cores=cores,
                      shuffle_partitions=cores)
    try:
        _prewarm(spark)
        lex = [(e.name, e.term_id) for e in build_lexicon()]
        _, closure = build_hierarchy_terms()
        df = spark.read.parquet(corpus_path).persist()
        df.count()  # materialize input outside the timed window
        hier = spark.createDataFrame(closure, HIERARCHY)
        best, n = float("inf"), None
        for _ in range(inner):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            triples = build_triples(df, lex, hierarchy=hier, cfg=PipelineConfig())
            n_run = triples.count()
            best = min(best, time.perf_counter() - t0)
            assert n is None or n == n_run
            n = n_run
        return best, n
    finally:
        spark.stop()


def _cpu_control(levels: list[int], chunk: int = 1_200_000) -> dict:
    """No-Spark CPython control: ``level`` processes each md5-hash ``chunk``
    values; per-level throughput bounds what ANY software can scale to on
    this box (turbo vs all-core base clock + shared cache). The Spark
    efficiency is reported raw AND normalized by this hardware ceiling —
    on a real N -> 4N EXECUTOR scale-out (separate machines, the north
    rule's actual claim) the per-core clock is constant and the raw number
    would not pay this tax."""
    import hashlib
    from multiprocessing import Process

    def burn(n: int) -> None:
        h = hashlib.md5()
        for i in range(n):
            h.update(b"%d" % i)

    out: dict[str, dict] = {}
    thr: dict[int, float] = {}
    for _rep in range(2):
        for lvl in levels:  # interleaved, same as the Spark levels
            procs = [Process(target=burn, args=(chunk,)) for _ in range(lvl)]
            t0 = time.perf_counter()
            for p in procs:
                p.start()
            for p in procs:
                p.join()
            wall = time.perf_counter() - t0
            tput = lvl * chunk / wall
            if lvl not in thr or tput > thr[lvl]:
                thr[lvl] = tput
    for lvl in levels:
        out[str(lvl)] = {"hashes_per_sec": round(thr[lvl], 0)}
    lo, hi = levels[0], levels[-1]
    out["efficiency"] = round((thr[hi] / thr[lo]) / (hi / lo), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores_hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pmcanalysis_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", cores=cores_hi)
    queries = _run_queries(spark, sf_dir)
    spark.catalog.clearCache()
    queries["cz_author_skew"] = round(_author_skew_probe(spark), 3)
    spark.catalog.clearCache()
    queries.update(_pair_counts_skew_probe(spark))
    spark.stop()

    spp = int(os.environ.get("SPARK_GRAFT_BENCH_SPP", "120"))
    corpus_path = os.environ.get("SPARK_GRAFT_BENCH_CORPUS", "/tmp/bench_corpus.parquet")
    _write_bench_corpus(N_BENCH_PAGES, spp, corpus_path)
    # three levels: N=2 vs 4N=8 is the contention-free scaling gate (the
    # 32-core level shares turbo/clock headroom with nothing and shows the
    # box's max throughput; its 8->32 efficiency is also reported).
    levels = sorted({2, max(2, cores_hi // 4), cores_hi})
    # 3 reps: the gate is the MEDIAN of the drift-matched per-rep ratios
    # (ADVICE r2: max over noisy ratios is upward-biased), and a median of 3
    # is robust to one bad noise window where a mean/median of 2 is not
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    walls: dict[int, list[float]] = {c: [] for c in levels}
    n_ref = None
    for _rep in range(reps):
        for c in levels:  # interleaved so machine-noise drift hits all levels
            wall, n = _run_pipeline(c, corpus_path)
            walls[c].append(wall)
            if n_ref is None:
                n_ref = n
            assert n == n_ref, f"triple counts diverge across parallelism: {n} vs {n_ref}"
    runs = {
        c: {
            "wall_sec": round(min(w), 3),
            "triples_per_sec": round(n_ref / min(w), 1),
            "all_walls": [round(x, 2) for x in w],
        }
        for c, w in walls.items()
    }

    # acceptance metric: triple P/R vs the miniature reference oracle
    from pmcanalysis_spark.fixtures import build_lexicon, build_web_pages
    from pmcanalysis_spark.operators.evaluate import triple_set_pr
    from pmcanalysis_spark.oracle import MiniOracle
    from pmcanalysis_spark.pipeline import build_triples
    from pmcanalysis_spark.schemas import WEB_PAGES

    pr_spark = get_spark(app_name="bench-pr", cores=min(8, cores_hi))
    corpus = build_web_pages(2000)
    lexicon = build_lexicon()
    got = build_triples(
        pr_spark.createDataFrame(corpus, WEB_PAGES),
        [(e.name, e.term_id) for e in lexicon],
    )
    exp_rows = [(r[0], r[1], r[2]) for r in MiniOracle(lexicon).triples(corpus)]
    exp = pr_spark.createDataFrame(exp_rows, "subj string, pred string, obj string")
    triple_pr = triple_set_pr(got, exp)
    pr_spark.stop()

    def eff(lo: int, hi: int) -> float:
        return round(
            (runs[hi]["triples_per_sec"] / runs[lo]["triples_per_sec"]) / (hi / lo), 3
        )

    lo, mid, hi = levels[0], levels[min(1, len(levels) - 1)], levels[-1]
    control = _cpu_control([lo, mid])
    # Drift-matched estimator: rep i runs the lo and mid levels back-to-back,
    # so the ratio WITHIN a rep compares the same machine-noise window, and
    # each level's wall is already the in-session steady-state best (see
    # _run_pipeline). The min-based number (independent per-level minima)
    # can pair a fast lo-window with a slow mid-window and flickers across
    # the gate on this box. The gate is the MEDIAN of the per-rep ratios
    # (ADVICE r2: a max over noisy ratios is upward-biased cherry-picking);
    # min/max are kept as spread diagnostics.
    import statistics

    pair_effs = [
        round((walls[lo][i] / walls[mid][i]) / (mid / lo), 3)
        for i in range(len(walls[lo]))
    ]
    raw_eff = round(statistics.median(pair_effs), 3)
    ceiling = max(control["efficiency"], 1e-9)
    pipeline = {
        "n_pages": N_BENCH_PAGES,
        "sentences_per_page": spp,
        "n_triples": n_ref,
        "runs": {str(c): runs[c] for c in levels},
        "scaling_gate": {
            "n_cores": lo,
            "four_n_cores": mid,
            "efficiency": raw_eff,
            "estimator": "median over drift-matched per-rep (lo,mid) pairs",
            "per_rep_efficiencies": pair_effs,
            "spread": {"min": min(pair_effs), "max": max(pair_effs)},
            "min_based_efficiency": eff(lo, mid),
            # hardware ceiling measured in-run: a no-Spark CPython burn at
            # the same two levels (turbo-vs-base-clock + shared-cache tax
            # that a real N->4N EXECUTOR scale-out would not pay)
            "cpu_control": control,
            "clock_normalized_efficiency": round(min(raw_eff / ceiling, 1.0), 3),
        },
        "scaling_8_to_32": eff(mid, hi) if mid != hi else None,
        "triples_per_sec_max": max(r["triples_per_sec"] for r in runs.values()),
        "scaling_efficiency": raw_eff,
        "triple_pr_vs_oracle": {
            "precision": round(triple_pr["precision"], 4),
            "recall": round(triple_pr["recall"], 4),
            "gate": ">= 0.95",
        },
    }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured numbers (this sandbox)\n\n"
            "Scaling evidence for the BASELINE.json north rule (N vs 4N executors,\n"
            "stood in by local parallelism levels on identical input/splits —\n"
            "64 fixed partitions, distributed-generated corpus of "
            f"{N_BENCH_PAGES} pages x {spp} sentences):\n\n"
            "| cores | wall sec | triples/sec |\n|---|---|---|\n"
            + "".join(
                f"| {c} | {runs[c]['wall_sec']} | {runs[c]['triples_per_sec']} |\n"
                for c in levels
            )
            + f"\nscaling efficiency N={lo} -> 4N={mid}: "
            f"**{pipeline['scaling_gate']['efficiency']}** (gate: >= 0.8; MEDIAN over "
            f"drift-matched per-rep pairs {pair_effs}, spread "
            f"[{min(pair_effs)}, {max(pair_effs)}] — each rep runs both levels "
            f"back-to-back in the same noise window; independent per-level minima "
            f"give {pipeline['scaling_gate']['min_based_efficiency']} and flicker "
            f"0.76-0.89 across identical-code runs on this box). "
            f"CPython no-Spark control efficiency at the same levels: "
            f"{control['efficiency']} (the box's turbo-vs-base-clock ceiling); "
            f"clock-normalized: "
            f"**{pipeline['scaling_gate']['clock_normalized_efficiency']}**\n\n"
            f"triple P/R vs miniature reference oracle (2000-page fixture): "
            f"precision={pipeline['triple_pr_vs_oracle']['precision']}, "
            f"recall={pipeline['triple_pr_vs_oracle']['recall']} (gate: >= 0.95)\n\n"
            f"efficiency {mid} -> {hi} cores: {pipeline['scaling_8_to_32']} — on this\n"
            "single-socket box the all-core regime runs at base clock while the\n"
            "low-core regime gets turbo headroom; a raw 32-process CPython burn\n"
            "(no Spark) shows the same per-core throughput drop, so the ceiling\n"
            "is environmental, not a plan property (see README scaling notes).\n\n"
            "Pipeline: extract(pandas UDF) -> trie NER(mapInPandas) -> closure -> "
            f"pair self-join -> 5 scores ({pipeline['n_triples']} triples emitted).\n\n"
            f"Per-query seconds at {sf_dir} on local[{cores_hi}]:\n\n"
            "| query | sec |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in queries.items())
        )

    print(
        json.dumps(
            {
                "metric": "total_runtime_sec",
                "value": round(sum(queries.values()), 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "pipeline": pipeline,
            }
        )
    )


if __name__ == "__main__":
    main()
