"""Point-lookup serving path (SURVEY.md S11-adjacent; reference
DoPhenoServer/DermoServlet, /root/reference/DermoServlet.groovy:45-502).

The reference serves queries from a Lucene index: an OWL query expands to a
class + its subclasses, the expansion becomes a boolean doc query, the top
1000 docs come back ranked. The Spark-native equivalent is a MATERIALIZED
inverted index (term_id -> doc_id), built once per corpus snapshot via
lineage.materialize_stage and sorted by term_id so point lookups prune to a
handful of row groups (parquet min/max stats; Iceberg/ZORDER at production
scale — same layout idea, managed manifests).

Serving is read-only over the snapshot: every lookup is a filter + groupBy
over the pruned scan — no driver-side index structure to keep in sync, and
the same tables answer both the servlet-style point queries and the batch
analytics (kg_serving_conjunction).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_serving_tables(
    doc_terms: DataFrame,
    lexicon: DataFrame,
    hierarchy: DataFrame | None,
    base_dir: str,
) -> dict[str, str]:
    """Materialize the serving snapshot: the inverted index (sorted by
    term_id for row-group pruning), the lexicon (name -> term_id, for
    autocomplete/label resolution) and the closure (for OWL expansion).

    Returns {table_name: path}. Each table goes through materialize_stage,
    so rebuilding with identical inputs resumes instead of rewriting.
    """
    from .lineage import materialize_stage

    paths: dict[str, str] = {}
    n_parts = max(doc_terms.sparkSession.sparkContext.defaultParallelism // 4, 1)
    # repartition FIRST, sort within partitions LAST: each parquet file then
    # holds a contiguous term_id range and the row-group min/max stats make
    # the point-lookup IN-filter prune (sorting before the repartition would
    # be destroyed by the shuffle)
    inv = (
        doc_terms.select("term_id", "doc_id")
        .distinct()
        .repartition(n_parts, "term_id")
        .sortWithinPartitions("term_id")
    )
    _, res = materialize_stage(
        inv,
        "serving_inverted",
        base_dir,
        key_col="term_id",
    )
    paths["inverted"] = os.path.join(res.path, "data")
    _, res = materialize_stage(
        lexicon.select("name", "term_id"), "serving_lexicon", base_dir, key_col="name"
    )
    paths["lexicon"] = os.path.join(res.path, "data")
    if hierarchy is not None:
        _, res = materialize_stage(
            hierarchy.select("term_id", "ancestor_id"),
            "serving_hierarchy",
            base_dir,
            key_col="term_id",
        )
        paths["hierarchy"] = os.path.join(res.path, "data")
    return paths


class KGIndex:
    """Read-only point-lookup API over a serving snapshot.

    Mirrors the servlet's query semantics (DermoServlet.groovy:56-87 OWL
    expansion; :440-447 ranked top-N):

    - ``expand(term_id)``: the class + every subclass (the closure stores
      (descendant, ancestor), so subclasses of X = rows with ancestor = X).
    - ``lookup(term_ids, mode)``: docs matching ANY expanded term ('or') or
      ALL query terms after expansion ('and' — each original term expands
      independently, a doc must hit one expansion member per term).
    - ``rank``: by number of distinct matched terms, then doc_id (the
      deterministic stand-in for Lucene relevance).
    - ``autocomplete(prefix, k)``: lexicon names by prefix, the servlet's
      jQuery autocomplete endpoint (W7).
    """

    def __init__(self, spark: SparkSession, paths: dict[str, str]):
        self.spark = spark
        self.inverted = spark.read.parquet(paths["inverted"])
        self.lexicon = spark.read.parquet(paths["lexicon"])
        self.hierarchy = (
            spark.read.parquet(paths["hierarchy"]) if "hierarchy" in paths else None
        )

    def expand(self, term_id: str) -> list[str]:
        """OWL expansion: the class itself plus all its subclasses."""
        out = [term_id]
        if self.hierarchy is not None:
            subs = (
                self.hierarchy.filter(F.col("ancestor_id") == term_id)
                .select("term_id")
                .collect()
            )
            out.extend(r["term_id"] for r in subs)
        return out

    def resolve(self, name: str) -> list[str]:
        """label -> term ids (multimap, J1 semantics)."""
        rows = (
            self.lexicon.filter(F.lower(F.col("name")) == name.lower())
            .select("term_id")
            .distinct()
            .collect()
        )
        return sorted(r["term_id"] for r in rows)

    def lookup(
        self, term_ids: list[str], mode: str = "or", limit: int = 1000
    ) -> DataFrame:
        """Point lookup: (doc_id, n_matched) ranked, top ``limit``.

        The IN-filter on term_id reaches the parquet scan (PushedFilters),
        so only row groups containing queried terms are read — the
        point-lookup cost is O(selected terms), not O(corpus).
        """
        expansions = {t: self.expand(t) for t in term_ids}
        all_terms = sorted({x for v in expansions.values() for x in v})
        hits = self.inverted.filter(F.col("term_id").isin(all_terms))
        if mode == "and" and len(expansions) > 1:
            # map each matched term back to its originating query term; a
            # doc must cover every query term's expansion
            mapping = [
                (member, orig)
                for orig, members in expansions.items()
                for member in members
            ]
            mdf = self.spark.createDataFrame(mapping, "term_id string, qterm string")
            per_q = (
                hits.join(F.broadcast(mdf), "term_id")
                .groupBy("doc_id")
                .agg(
                    F.countDistinct("qterm").alias("n_q"),
                    F.countDistinct("term_id").alias("n_matched"),
                )
                .filter(F.col("n_q") == len(expansions))
            )
            ranked = per_q.select("doc_id", "n_matched")
        else:
            ranked = hits.groupBy("doc_id").agg(
                F.countDistinct("term_id").alias("n_matched")
            )
        return ranked.orderBy(F.desc("n_matched"), F.asc("doc_id")).limit(limit)

    def autocomplete(self, prefix: str, k: int = 10) -> list[str]:
        rows = (
            self.lexicon.filter(F.lower(F.col("name")).startswith(prefix.lower()))
            .select("name")
            .distinct()
            .orderBy("name")
            .limit(k)
            .collect()
        )
        return [r["name"] for r in rows]


def highlight_snippets(
    docs: DataFrame,
    lexicon: DataFrame,
    width: int = 30,
    text_col: str = "text",
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
) -> DataFrame:
    """Snippet highlighting for serving results (the DataFrame half of the
    reference's Lucene highlighter, /root/reference/DermoServlet.groovy:
    443-502: best-fragment extraction + tag-wrapped match rendered around
    each hit): for every (doc, lexicon name) whose name occurs in the text,
    emit (doc_id, term_id, snippet) where snippet is a +-``width``-char
    window around the FIRST occurrence with the match wrapped in
    ``pre_tag``/``post_tag``.

    Char-grain first-occurrence fragments by design (Lucene's fragmenter is
    also char-budgeted); multi-occurrence rendering is the HTTP layer's
    pagination concern, not the engine's. Plan: one broadcast join of the
    tiny lexicon against the doc scan (J1 shape), then pure string column
    algebra — no shuffle at all, no Python; the filter (instr > 0) sits
    directly on the joined scan."""
    pos = F.instr(F.col(text_col), F.col("name"))
    start = F.greatest(F.lit(1), pos - width)
    snippet = F.concat(
        F.substring(F.col(text_col), start, pos - start),
        F.lit(pre_tag),
        F.col("name"),
        F.lit(post_tag),
        F.substring(F.col(text_col), pos + F.length("name"), F.lit(width)),
    )
    return (
        docs.join(F.broadcast(lexicon.select("name", "term_id")), pos > 0)
        .select("doc_id", "term_id", snippet.alias("snippet"))
    )
