#!/usr/bin/env python
"""spark-submit entry point for the full KG construction job (north_rule:
"ships as spark-submit --py-files across N and 4N executor clusters").

Usage (cluster):
    zip -r pmcanalysis_spark.zip pmcanalysis_spark
    spark-submit --py-files pmcanalysis_spark.zip scripts/run_pipeline.py \
        --input  <web_pages parquet/iceberg path> \
        --lexicon <obo file | lexicon parquet> \
        --hierarchy <closure parquet (term_id, ancestor_id)> \
        --output <stage dir> [--lang en] [--a-prefix DOID:] [--b-prefix HP: --b-prefix MP:]

Local smoke (this sandbox): --synthetic N generates the deterministic
fixture corpus instead of reading --input.

Every stage checkpoints through lineage.materialize_stage: re-running with
identical inputs resumes from the committed snapshots (prints "resumed").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs: make the repo root importable (spark-submit --py-files covers
# the cluster case)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="web_pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N fixture pages instead of --input")
    ap.add_argument("--lexicon", help=".obo file or parquet of (name, term_id)")
    ap.add_argument("--hierarchy", help="parquet of (term_id, ancestor_id) closure")
    ap.add_argument("--output", required=True, help="stage/checkpoint base dir")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--a-prefix", default="DOID:")
    ap.add_argument("--b-prefix", action="append", default=None)
    ap.add_argument("--pred", default="has-phenotype")
    ap.add_argument("--cores", type=int, default=None, help="local mode cores (ignored under a real master)")
    ap.add_argument("--range-partitions", type=int, default=None,
                    help="repartitionByRange(url) on ingest (disjoint lineage key ranges)")
    ap.add_argument("--stream", action="store_true",
                    help="incremental mode: drain new --input files (availableNow), "
                         "append doc_terms exactly-once, re-score triples over the "
                         "accumulator (empty drains resume)")
    ap.add_argument("--neardup", action="store_true",
                    help="also materialize the text near-dup cluster stage "
                         "(MinHash-LSH candidates -> exact-Jaccard confirm -> "
                         "connected components -> (url, cluster_id))")
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--clean", action="store_true",
                    help="run the C4/Gopher-style keep_filter gate before "
                         "extraction; materializes the per-url keep decision "
                         "(with reasons) as its own resumable stage")
    ap.add_argument("--clean-min-tokens", type=int, default=20)
    ap.add_argument("--clean-max-dup-frac", type=float, default=0.3)
    ap.add_argument("--clean-min-quality", type=float, default=0.5)
    ap.add_argument("--authors", default=None,
                    help="author-records table path (doc_id, author_key, "
                         "coauthors, mesh, title_tokens, affiliation_tokens) "
                         "— materializes author entity canonicalization plus "
                         "the mega-key lineage stage")
    ap.add_argument("--authors-synthetic", type=int, default=0,
                    help="generate N synthetic author records (incl. one "
                         "mega key when N >= 200) instead of --authors")
    ap.add_argument("--author-max-group", type=int, default=10000,
                    help="within-key cross-product cap; bigger keys go "
                         "through coauthor-MinHash blocking and are logged "
                         "to the author_mega_keys lineage stage")
    ap.add_argument("--media", default=None,
                    help="media table path (media_id, kind, mime, n_bytes, "
                         "payload) — materializes the media_features stage")
    ap.add_argument("--media-synthetic", type=int, default=0,
                    help="generate N synthetic media rows (codec-free PGM "
                         "images + FAKE-codec payloads) instead of --media")
    ap.add_argument("--decoder", default=None,
                    help="codec hook import string 'pkg.module:callable' "
                         "passed to extract_media_features(decoder=...); "
                         "see pmcanalysis_spark.codecs (e.g. "
                         "'pmcanalysis_spark.codecs:fake_fast_decoder')")
    ap.add_argument("--frame-every", type=int, default=10,
                    help="video frame sampling stride for the media stage")
    ap.add_argument("--snapshot-table", default=None,
                    help="also commit the canonical triples into a versioned "
                         "SnapshotTable at this path (time-travelable history, "
                         "one snapshot per run)")
    ap.add_argument("--compact-target-mb", type=int, default=None,
                    help="after the snapshot commit, run small-file compaction "
                         "(rewrite_data_files) on the table toward this file "
                         "size; no-op when the current snapshot is already "
                         "one data-file group")
    ap.add_argument("--train-bpe", type=int, default=0,
                    help="learn N BPE merges from the (cleaned) corpus text "
                         "and materialize the merge table as a bpe_merges "
                         "stage — the tokenizer-training step of the "
                         "training-data pipeline (operators/bpe.py)")
    ap.add_argument("--serve-tables", default=None,
                    help="also materialize the point-lookup serving snapshot "
                         "(sorted inverted index + lexicon + hierarchy) at this "
                         "path — the index-build half of the reference's "
                         "Lucene+servlet flow; front it with "
                         "pmcanalysis_spark.server.KGServer (batch mode only)")
    args = ap.parse_args(argv)

    import hashlib

    from pmcanalysis_spark.lineage import materialize_stage, try_resume
    from pmcanalysis_spark.pipeline import PipelineConfig, build_triples
    from pmcanalysis_spark.session import get_spark

    spark = get_spark(app_name="kg-pipeline", cores=args.cores)

    # job fingerprint from the arguments: resume check happens BEFORE any
    # plan construction or execution (north_rule: resume from last snapshot).
    # A triples-resume does NOT return early: the entities and
    # triples_canonical stages resume (or run) independently off their own
    # manifests — a run that crashed between stages completes on rerun.
    fp = hashlib.md5(
        json.dumps(vars(args), default=str, sort_keys=True).encode()
    ).hexdigest()

    # the lexicon is needed by the entities stage even on a triples-resume
    if args.lexicon and args.lexicon.endswith(".obo"):
        from pmcanalysis_spark.sources.obo import parse_obo_file

        lex = [(n, t) for n, t, _k in parse_obo_file(args.lexicon)]
    elif args.lexicon:
        lex = [
            (r["name"], r["term_id"])
            for r in spark.read.parquet(args.lexicon).collect()
        ]
    else:
        from pmcanalysis_spark.fixtures import build_lexicon

        lex = [(e.name, e.term_id) for e in build_lexicon()]

    hier = None
    if args.hierarchy:
        hier = spark.read.parquet(args.hierarchy)
    elif args.lexicon and args.lexicon.endswith(".obo"):
        # the same OBO file carries the is_a axioms: build the closure
        # from it (S6 production side) unless an explicit --hierarchy
        # parquet overrides
        from pmcanalysis_spark.sources.obo import hierarchy_from_obo

        hier = hierarchy_from_obo(spark, path=args.lexicon)
    elif args.synthetic:
        from pmcanalysis_spark.fixtures import build_hierarchy_terms
        from pmcanalysis_spark.schemas import HIERARCHY

        _, closure = build_hierarchy_terms()
        hier = spark.createDataFrame(closure, HIERARCHY)

    cfg = PipelineConfig(
        lang=args.lang,
        a_prefix=args.a_prefix,
        b_prefixes=tuple(args.b_prefix or ["HP:", "MP:"]),
        pred=args.pred,
    )

    t0 = time.perf_counter()
    if args.stream:
        from pmcanalysis_spark.streaming.incremental import run_incremental_kg

        out, res = run_incremental_kg(
            spark, args.input, args.output, lex, hierarchy=hier, cfg=cfg
        )
    else:
        def load_pages():
            """Input pages with ingest + (optional) clean gate applied —
            shared by the triples build and the serving-snapshot build so a
            resumed triples stage can still derive the same page set (the
            keep_decisions stage resumes through its own fingerprint)."""
            if args.synthetic:
                from pmcanalysis_spark.fixtures import bench_pages_df

                pages = bench_pages_df(spark, args.synthetic)
            else:
                pages = spark.read.parquet(args.input)

            from pmcanalysis_spark.pipeline import ingest

            pages = ingest(pages, args.range_partitions)

            if args.clean:
                # cleaning gate before extraction: materialize the keep
                # decision (auditable — reasons per url), feed only kept
                # pages forward. keep_filter is one narrow select, so the
                # stage costs one scan + the checkpoint write.
                from pmcanalysis_spark.operators.textstats import keep_filter

                decisions = keep_filter(
                    pages, id_col="url",
                    min_tokens=args.clean_min_tokens,
                    max_dup_frac=args.clean_max_dup_frac,
                    min_quality=args.clean_min_quality,
                )
                kd, _kres = materialize_stage(
                    decisions, "keep_decisions", args.output, key_col="doc_id",
                    fingerprint=fp + "|clean",
                )
                kept = kd.filter(kd.keep == 1).select(
                    kd.doc_id.alias("_keep_url")
                )
                pages = pages.join(
                    kept, pages.url == kept._keep_url, "left_semi"
                )
            return pages

        resumed = try_resume(spark, args.output, "triples", fp)
        if resumed is not None:
            out, res = resumed
        else:
            web_pages = load_pages()
            triples = build_triples(web_pages, lex, hierarchy=hier, cfg=cfg)
            out, res = materialize_stage(
                triples, "triples", args.output, key_col="subj", fingerprint=fp
            )

    # entity canonicalization stage (north_star): merge xref/name-shared
    # terms, materialize the entities map and the canonical triple table.
    # In stream mode the downstream fingerprint is the triples stage's OWN
    # (accumulator-snapshot) fingerprint — the argv hash is stable across
    # drains and would wrongly resume stale canonical triples.
    stage_fp = res.input_fingerprint if args.stream else fp
    from pmcanalysis_spark.canonicalize import canonicalize_terms, rewrite_triples_canonical

    lex_df = spark.createDataFrame(
        [(n, t, "name") for n, t in lex], "name string, term_id string, kind string"
    )
    entities = canonicalize_terms(lex_df)
    ents, eres = materialize_stage(
        entities, "entities", args.output, key_col="term_id", fingerprint=stage_fp
    )
    canon_triples = rewrite_triples_canonical(
        out.select("subj", "pred", "obj", "nab", "na", "nb", "npmi"), ents
    )
    _, cres = materialize_stage(
        canon_triples, "triples_canonical", args.output, key_col="subj", fingerprint=stage_fp
    )
    summary = {
        "stage": res.stage,
        "resumed": res.resumed,
        "n_triples": res.row_count,
        "n_entities": eres.row_count,
        "n_canonical_triples": cres.row_count,
        "n_partitions": res.n_partitions,
    }

    # optional dedup stage: cluster assignment over the corpus text,
    # checkpointed like every other stage (its manifest resumes on rerun)
    if args.neardup:
        from pmcanalysis_spark.operators.dedup import neardup_text_clusters

        if args.synthetic:
            from pmcanalysis_spark.fixtures import bench_pages_df

            pages = bench_pages_df(spark, args.synthetic)
        else:
            pages = spark.read.parquet(args.input)
        clusters = neardup_text_clusters(
            pages, id_col="url", text_col="text",
            threshold=args.neardup_threshold,
        )
        _, nres = materialize_stage(
            clusters, "neardup_clusters", args.output, key_col="doc_id",
            fingerprint=stage_fp + "|neardup",
        )
        summary["n_neardup_rows"] = nres.row_count
        summary["neardup_resumed"] = nres.resumed

    # optional author-canonicalization stage: entity ids via blocked
    # pairwise similarity + connected components, WITH the mega-key lineage
    # stage (VERDICT r4 #2: a 'J. Smith' over the cap must be visible in
    # lineage, never silently re-routed through blocking)
    if args.authors or args.authors_synthetic:
        from pmcanalysis_spark.canonicalize import (
            canonicalize_authors, mega_key_stats)

        if args.authors_synthetic:
            from pmcanalysis_spark.fixtures import build_author_records_scaled

            records = spark.createDataFrame(
                build_author_records_scaled(args.authors_synthetic),
                "doc_id string, author_key string, coauthors array<string>, "
                "mesh array<string>, title_tokens array<string>, "
                "affiliation_tokens array<string>",
            )
        else:
            records = spark.read.parquet(args.authors)
        mega = mega_key_stats(records, max_group_size=args.author_max_group)
        _, mkres = materialize_stage(
            mega, "author_mega_keys", args.output, key_col="author_key",
            fingerprint=stage_fp + f"|authors|{args.author_max_group}",
        )
        ents_df = canonicalize_authors(
            records, max_group_size=args.author_max_group
        )
        _, ares = materialize_stage(
            ents_df, "author_entities", args.output, key_col="author_key",
            fingerprint=stage_fp + f"|authors|{args.author_max_group}",
        )
        summary["n_author_entities"] = ares.row_count
        summary["n_mega_keys"] = mkres.row_count
        summary["authors_resumed"] = ares.resumed

    # optional tokenizer-training stage: learn the BPE merge table from the
    # same (cleaned) page text the triples build reads; the merge table is a
    # materialized KB-scale artifact (rank, left, right, count) any encoder
    # job replays via encode_bpe
    if args.train_bpe and not args.stream:
        from pmcanalysis_spark.operators.bpe import train_bpe

        merges = train_bpe(
            load_pages().select("url", "text"), n_merges=args.train_bpe
        )
        merges_df = spark.createDataFrame(
            merges or [], "rank int, left string, right string, count long"
        )
        _, bres = materialize_stage(
            merges_df, "bpe_merges", args.output, key_col="rank",
            fingerprint=stage_fp + f"|bpe|{args.train_bpe}",
        )
        summary["n_bpe_merges"] = bres.row_count
        summary["bpe_resumed"] = bres.resumed

    # optional media-features stage: decode / feature-extract / frame-sample
    # through ONE Arrow-batched pass, with the production codec routed in
    # via --decoder (VERDICT r4 #3: the hook must be reachable from the
    # spark-submit job, not only the operator API)
    if args.media or args.media_synthetic:
        from pmcanalysis_spark.multimodal import extract_media_features

        decoder = None
        if args.decoder:
            from pmcanalysis_spark.codecs import resolve_decoder

            decoder = resolve_decoder(args.decoder)
        if args.media_synthetic:
            from pmcanalysis_spark.fixtures import build_media_rows
            from pmcanalysis_spark.multimodal import MEDIA

            # FAKE-codec payloads only make sense when a decoder claims
            # them (the built-in tier rejects unknown formats loudly)
            media = spark.createDataFrame(
                build_media_rows(
                    args.media_synthetic, include_fake=decoder is not None
                ),
                MEDIA,
            )
        else:
            media = spark.read.parquet(args.media)
        feats = extract_media_features(
            media, frame_every=args.frame_every, decoder=decoder
        )
        _, mres = materialize_stage(
            feats, "media_features", args.output, key_col="media_id",
            fingerprint=stage_fp + "|media|" + (args.decoder or "builtin"),
        )
        summary["n_media_features"] = mres.row_count
        summary["media_resumed"] = mres.resumed
        summary["media_decoder"] = args.decoder or "builtin"

    # optional serving snapshot: raw (un-closed) doc_terms into the sorted
    # inverted index + lexicon + hierarchy tables KGIndex/KGServer read —
    # OWL expansion happens at query time (KGIndex.expand), matching the
    # reference servlet, so the index stores mentions, not closures. Batch
    # mode only: the stream path's doc_terms live in the accumulator table.
    if args.serve_tables:
        if args.stream:
            raise SystemExit("--serve-tables requires batch mode (no --stream)")
        from pmcanalysis_spark.nlp import detect_doc_terms
        from pmcanalysis_spark.serving import build_serving_tables

        serve_dt = detect_doc_terms(load_pages(), lex, lang=args.lang)
        lex_df2 = spark.createDataFrame(lex, "name string, term_id string")
        serve_paths = build_serving_tables(
            serve_dt, lex_df2, hier, args.serve_tables
        )
        summary["serving_tables"] = serve_paths

    # optional snapshot-table sink: commit the canonical triples into the
    # versioned table (snapshots.SnapshotTable — append/overwrite history,
    # time travel, optimistic commits); each pipeline run adds a snapshot,
    # so consumers can pin or diff runs
    if args.snapshot_table:
        from pmcanalysis_spark.snapshots import SnapshotTable

        table = SnapshotTable(spark, args.snapshot_table)
        snap_id = table.commit(
            spark.read.parquet(os.path.join(args.output, "triples_canonical", "data")),
            mode="overwrite",
        )
        summary["snapshot_id"] = snap_id
        summary["snapshot_table"] = args.snapshot_table
        if args.compact_target_mb:
            compacted = table.compact(
                target_file_size_bytes=args.compact_target_mb * 1024 * 1024
            )
            summary["compacted_snapshot_id"] = compacted

    wall = time.perf_counter() - t0
    summary["wall_sec"] = round(wall, 2)
    summary["triples_per_sec"] = round(res.row_count / wall, 2) if wall else None
    summary["path"] = res.path
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
