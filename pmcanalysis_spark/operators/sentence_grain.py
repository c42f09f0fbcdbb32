"""Sentence-grain co-occurrence (the ParseMedline3 lifecycle, SURVEY.md §3.2).

Differences from the document-grain flagship (FindDiseasePhenotypes2):
- the unit of evidence is the SENTENCE: a pair counts once per sentence where
  both families match (ParseMedline3.groovy:305-320), and occurrence counts
  count every mention (A5), not distinct docs;
- counts roll UP the hierarchy by summation (A6) — the reference's buggy
  roll-up (`phenosuper = id2super[dis]` at :394, undefined `val1` at :399)
  is replaced by the intended semantics: each family rolls up through its own
  ancestors; divergence documented in SURVEY.md §7.4;
- scoring is NPMI over mention totals (ParseMedline3.groovy:56-64 —
  algebraically the same npmi as F1).

All aggregation is native; the NER pass is the same mentions table the
flagship uses (sentence spans preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sentence_pair_counts(
    mentions: DataFrame, a_prefix: str, b_prefix: str,
    max_pairs_per_sentence: int | None = None,
) -> DataFrame:
    """(a_id, b_id, nab): nab = number of (doc, sentence) units where both
    ids match. Mentions of the same id in one sentence count the unit once
    (the reference increments per match-pair product; we count the distinct
    unit — divergence flagged: reference multiplies m x n per sentence,
    which double-counts repeated surface matches; SURVEY §7.4 defensive cap).

    ``max_pairs_per_sentence`` drops pathological sentences whose cross
    product exceeds the cap (logged to lineage in production) — the skew
    guard for adversarial web pages.
    """
    sent = mentions.select(
        "url", "sent_idx", "term_id"
    ).distinct()
    a = sent.filter(F.col("term_id").startswith(a_prefix)).select(
        F.col("term_id").alias("a_id"), "url", "sent_idx"
    )
    b = sent.filter(F.col("term_id").startswith(b_prefix)).select(
        F.col("term_id").alias("b_id"), "url", "sent_idx"
    )
    if max_pairs_per_sentence is not None:
        na = a.groupBy("url", "sent_idx").agg(F.count("*").alias("_na"))
        nb = b.groupBy("url", "sent_idx").agg(F.count("*").alias("_nb"))
        ok = (
            na.join(nb, ["url", "sent_idx"])
            .filter(F.col("_na") * F.col("_nb") <= max_pairs_per_sentence)
            .select("url", "sent_idx")
        )
        a = a.join(ok, ["url", "sent_idx"], "left_semi")
        b = b.join(ok, ["url", "sent_idx"], "left_semi")
    return (
        a.join(b, ["url", "sent_idx"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("nab"))
    )


def mention_occurrence_counts(mentions: DataFrame) -> DataFrame:
    """A5: +1 per mention row (sentence grain, multimapped ids each count)."""
    return mentions.groupBy("term_id").agg(F.count("*").alias("cnt"))


def rollup_counts(counts: DataFrame, hierarchy: DataFrame) -> DataFrame:
    """A6: add each term's count into every ancestor, keep base counts.
    ``hierarchy`` is the transitive closure, so one join suffices."""
    inherited = (
        counts.join(F.broadcast(hierarchy), "term_id")
        .groupBy(F.col("ancestor_id").alias("term_id"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    return (
        counts.unionByName(inherited)
        .groupBy("term_id")
        .agg(F.sum("cnt").alias("cnt"))
    )


def npmi_scored_sentence_pairs(
    pairs: DataFrame, occ: DataFrame, band: tuple[float, float] | None = None
) -> DataFrame:
    """NPMI over mention totals (ParseMedline3.groovy:56-64, 329-357):
    total = sum of all occurrence counts; x/y = per-term occurrence; xy = nab.
    Optional P4 band filter (FindDrugEffects.groovy:212)."""
    from ..functions.scores import npmi_col

    total_df = occ.agg(F.sum("cnt").cast("double").alias("t"))
    xa = F.broadcast(occ.select(F.col("term_id").alias("a_id"), F.col("cnt").alias("na")))
    xb = F.broadcast(occ.select(F.col("term_id").alias("b_id"), F.col("cnt").alias("nb")))
    df = (
        pairs.join(xa, "a_id").join(xb, "b_id").crossJoin(F.broadcast(total_df))
        .withColumn(
            "npmi",
            npmi_col(
                F.col("t"),
                F.col("na").cast("double"),
                F.col("nb").cast("double"),
                F.col("nab").cast("double"),
            ),
        )
        .select("a_id", "b_id", "nab", "na", "nb", "npmi")
    )
    if band is not None:
        df = df.filter(F.col("npmi").between(*band))
    return df
