"""TSV dimension sources (SURVEY.md S7/S8) and sinks (S9/S10).

Distributed csv scans with the reference's cleanup semantics expressed as
native Column expressions (whole-stage codegen, no Python):

- STITCH alias scan: source-whitelist filter + id rewrites
  (FindDrugPhenotypes.groovy:146-154; ParseMedlineForDrugEffects.groovy:
  179-194 — ``CID`` prefix and ``-`` both rewritten to ``STITCHTM:``).
- phenotype_annotation.tab scan: composite ``col0:col1`` id, leading-code
  strip regex, ``;;`` synonym split (ParseMedline3.groovy:178-200).
- N-Triples sink for entity rows (Author2PMID.groovy:163-167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STITCH_SOURCES = [
    "ATC", "BindingDB", "ChEMBL", "ChEBI", "DrugBank", "KEGG",
    "MATADOR", "PC", "PDB", "SIDER", "TTD", "Wikipedia",
]


def stitch_alias_scan(
    spark: SparkSession, path: str, sources: list[str] | None = None
) -> DataFrame:
    """(chemical, alias, origin) TSV -> (name, term_id) with whitelist +
    CID->STITCHTM: rewrite. Pushdown-friendly: the filter and projection
    reach the scan."""
    df = (
        spark.read.option("sep", "\t")
        .option("header", "false")
        .csv(path)
        .toDF("chemical", "alias", "origin")
    )
    return (
        df.filter(F.col("origin").isin(sources or STITCH_SOURCES))
        .select(
            F.lower(F.col("alias")).alias("name"),
            F.regexp_replace(F.col("chemical"), "^CID|^-", "STITCHTM:").alias("term_id"),
        )
    )


def phenotype_annotation_scan(spark: SparkSession, path: str) -> DataFrame:
    """phenotype_annotation.tab -> (name, term_id): composite id col0:col1,
    strip leading disease-code token (^.\\d{6}), split ;;-joined synonyms."""
    df = spark.read.option("sep", "\t").option("header", "false").csv(path)
    base = df.select(
        F.concat_ws(":", F.col("_c0"), F.col("_c1")).alias("term_id"),
        F.regexp_replace(F.col("_c2"), r"^.\d\d\d\d\d\d\s*", "").alias("names_raw"),
    )
    return (
        base.select(
            "term_id", F.explode(F.split(F.col("names_raw"), ";;")).alias("name")
        )
        .select(F.lower(F.trim(F.col("name"))).alias("name"), "term_id")
        .filter(F.col("name") != "")
    )


def to_ntriples(entities: DataFrame, iri_col: str, pred_col: str, obj_col: str,
                obj_is_iri: bool = True) -> DataFrame:
    """(iri, predicate, object) -> one N-Triples line per row (S10)."""
    obj = (
        F.concat(F.lit("<"), F.col(obj_col), F.lit(">"))
        if obj_is_iri
        else F.concat(F.lit('"'), F.col(obj_col), F.lit('"'))
    )
    return entities.select(
        F.concat(
            F.lit("<"), F.col(iri_col), F.lit("> <"), F.col(pred_col), F.lit("> "),
            obj, F.lit(" ."),
        ).alias("ntriple")
    )


GAF_HEADER = (
    "!DB, Object ID, Object Symbol, Qualifier (score), Phenotype ID, "
    "Reference, Evidence Code, <empty>, Aspect, DB Object Name, "
    "DB Object Synonym, DB Object Type, Taxon, Date, Assigned By, "
    "Annotation Extension, Gene Product Form ID"
)


def to_gaf(
    triples: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
    name_col: str = "subj_name",
    score_col: str | None = None,
    db: str = "Aber-OWL",
    reference: str = "http://arxiv.org/abs/1411.0450",
    evidence: str = "ITM",
    object_type: str = "disease",
    taxon: str = "taxon:9606",
    date: str = "6/1/2015",
    assigned_by: str = "Robert Hoehndorf",
) -> DataFrame:
    """(subj, obj, subj_name[, score]) -> one GAF-format line per row (F13
    production side; /root/reference/MakeDOAFile.groovy:1-10: qualifier
    column carries the association score, reference/evidence/taxon/date are
    job constants). Emit with ``df.write.text`` after prepending GAF_HEADER.
    """
    qualifier = (
        F.col(score_col).cast("string") if score_col else F.lit(evidence)
    )
    return triples.select(
        F.concat_ws(
            "\t",
            F.lit(db),
            F.col(subj_col),
            F.col(name_col),
            qualifier,
            F.col(obj_col),
            F.lit(reference),
            F.lit(evidence),
            F.lit(""),
            F.lit(""),
            F.col(name_col),
            F.col(name_col),
            F.lit(object_type),
            F.lit(taxon),
            F.lit(date),
            F.lit(assigned_by),
            F.lit(""),
            F.lit(""),
        ).alias("gaf_line")
    )
