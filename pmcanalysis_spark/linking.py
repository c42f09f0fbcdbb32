"""Candidate entity-link scoring (SURVEY.md §7.2 step 5; north_star:
"score candidate entity links with vectorized TF-IDF/context-similarity
UDFs").

The reference links a matched surface form to ALL candidate ids
(ParseMedline3.groovy:284-291 — ``name2id`` is a multimap). Parity mode
keeps that. Scored mode ranks the candidates: each ontology term carries a
context profile (the bag of words of all its names/synonyms); a mention's
context (its sentence minus the matched span) is TF-IDF-weighted and
cosine-compared to each candidate profile.

Implementation: term profiles are tiny -> built on the driver, broadcast as
{term_id: {token: weight}}; the scorer is ONE Arrow-batched pandas UDF over
the mentions table (no per-row Python, no shuffle — the mention row already
carries its sentence context).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .nlp import tokenize_py

LINKED_MENTIONS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("term_id", StringType(), False),
        StructField("link_score", DoubleType(), True),
        StructField("link_rank", IntegerType(), False),
    ]
)


def build_term_profiles(
    lexicon_entries: list[tuple[str, str]],
) -> dict[str, dict[str, float]]:
    """term_id -> {token: tf-idf weight} from the term's own names/synonyms.

    IDF over the 'corpus' of term profiles (a token shared by many terms is
    uninformative for disambiguation).
    """
    term_tokens: dict[str, Counter] = defaultdict(Counter)
    for name, tid in lexicon_entries:
        term_tokens[tid].update(tokenize_py(name))
    n_terms = max(len(term_tokens), 1)
    df_count: Counter = Counter()
    for toks in term_tokens.values():
        df_count.update(set(toks))
    profiles: dict[str, dict[str, float]] = {}
    for tid, toks in term_tokens.items():
        vec = {
            t: tf * math.log((1 + n_terms) / (1 + df_count[t]))
            for t, tf in toks.items()
        }
        norm = math.sqrt(sum(w * w for w in vec.values())) or 1.0
        profiles[tid] = {t: w / norm for t, w in vec.items()}
    return profiles


def score_links_py(
    context_tokens: list[str], candidates: list[str],
    profiles: dict[str, dict[str, float]],
) -> list[tuple[str, float]]:
    """Rank candidate term_ids by cosine(context tf, candidate profile).
    Deterministic tie-break by term_id. Pure function (oracle-testable)."""
    ctx = Counter(context_tokens)
    cnorm = math.sqrt(sum(v * v for v in ctx.values())) or 1.0
    scored = []
    for tid in candidates:
        prof = profiles.get(tid, {})
        s = sum((tf / cnorm) * prof.get(t, 0.0) for t, tf in ctx.items())
        scored.append((tid, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored


def link_mentions(
    mentions_with_context: DataFrame,
    lexicon_entries: list[tuple[str, str]],
) -> DataFrame:
    """mentions(url, sent_idx, name, sentence) -> one row per candidate with
    (link_score, link_rank). Input must carry the sentence text; ambiguity
    comes from the lexicon multimap.
    """
    sc = mentions_with_context.sparkSession.sparkContext
    name2ids: dict[str, list[str]] = defaultdict(list)
    for name, tid in lexicon_entries:
        if tid not in name2ids[name.lower()]:
            name2ids[name.lower()].append(tid)
    bprofiles = sc.broadcast(build_term_profiles(lexicon_entries))
    bnames = sc.broadcast(dict(name2ids))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        profiles = bprofiles.value
        n2i = bnames.value
        for pdf in batches:
            urls, sidx, names, tids, scores, ranks = [], [], [], [], [], []
            for url, si, name, sentence in zip(
                pdf["url"], pdf["sent_idx"], pdf["name"], pdf["sentence"]
            ):
                cands = n2i.get(name, [])
                if not cands:
                    continue
                ctx = [t for t in tokenize_py(sentence or "")
                       if t not in set(name.split())]
                for rank, (tid, s) in enumerate(
                    score_links_py(ctx, sorted(cands), profiles), start=1
                ):
                    urls.append(url)
                    sidx.append(int(si))
                    names.append(name)
                    tids.append(tid)
                    scores.append(float(s))
                    ranks.append(rank)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "sent_idx": pd.Series(sidx, dtype="int32"),
                    "name": pd.Series(names, dtype="object"),
                    "term_id": pd.Series(tids, dtype="object"),
                    "link_score": pd.Series(scores, dtype="float64"),
                    "link_rank": pd.Series(ranks, dtype="int32"),
                }
            )

    return mentions_with_context.select(
        "url", "sent_idx", "name", "sentence"
    ).mapInPandas(score, schema=LINKED_MENTIONS)


def bm25_scores(
    docs: DataFrame,
    lexicon: list[tuple[str, str]],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every dictionary term to every document containing
    it: (doc_id, term_id, tf, bm25) — the ranking function a serving layer
    actually sorts by (Lucene's default since 6.0), complementing the
    tf-idf-cosine linker above.

    bm25 = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with the
    Robertson-Sparck-Jones idf = ln(1 + (N - df + 0.5)/(df + 0.5)); dl is
    the document's token count, avgdl the corpus mean. All Column algebra:
    one explode -> broadcast lexicon join -> (doc, term) count for tf, a
    (term) count for df, a per-doc count for dl, and two 1-row aggregates
    (N, avgdl) broadcast-cross-joined — every shuffle keys on doc or term
    (uniform), nothing Python-side. bm25 is ROUND(6) for cross-engine
    comparability (CLAUDE.md float recipe).
    """
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    lex = spark.createDataFrame(lexicon, "name string, term_id string")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = toks.join(F.broadcast(lex), toks.tok == F.col("name")).select(
        "doc_id", "term_id"
    )
    tf = hits.groupBy("doc_id", "term_id").agg(F.count("*").alias("tf"))
    df_ = hits.select("doc_id", "term_id").distinct().groupBy("term_id").agg(
        F.count("*").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df_), "term_id")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term_id",
            "tf",
            F.round(idf * F.col("tf") * (k1 + 1.0) / denom, 6).alias("bm25"),
        )
    )


def anchor_entity_links(
    resolved_links: DataFrame,
    lexicon: DataFrame,
    anchor_col: str = "anchor",
    host_col: str = "dst_host",
    name_col: str = "name",
    id_col: str = "term_id",
) -> DataFrame:
    """(term_id, dst_host, n_links) — entity→host edges from anchor text:
    how often link anchors naming an ontology entity point at each host.
    The anchor-text KG signal (anchors are human-written entity labels for
    the page behind the link — the classic wikification prior), composed
    from `extract.extract_links` → `graph.resolve_hosts` output and the
    same lexicon the NER trie uses. Matching is whole-token on the
    normalized anchor (lowercase, whitespace split), and the lexicon is a
    MULTIMAP exactly like the reference's name2id
    (ParseMedline3.groovy:284-291): an ambiguous name yields one edge per
    candidate id.

    Scale shape: the anchor stream (10^13 rows at crawl scale) explodes to
    tokens and BROADCAST-joins the lexicon (MBs) — the big side never
    shuffles until the final (term_id, host) count, whose key space is
    entities × hosts with map-side partials absorbing head entities.
    Zero Python UDFs."""
    from pyspark.sql import functions as F

    toks = resolved_links.select(
        F.col(host_col).alias("dst_host"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(anchor_col)), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("token"),
    )
    lex = F.broadcast(
        lexicon.select(
            F.lower(F.col(name_col)).alias("token"), F.col(id_col).alias("term_id")
        ).distinct()
    )
    return (
        toks.join(lex, "token")
        .groupBy("term_id", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
