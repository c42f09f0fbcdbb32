"""Medline-style XML article source (SURVEY.md S1, literal-XML mode).

The reference's scan stage is XmlSlurper GPath over Medline citation files
(IndexMedline.groovy:91-122; the author/mesh/affiliation extraction at
Author2PMID.groovy:51-87). This is the Spark-native equivalent: one
Arrow-batched mapInPandas over a DataFrame of raw XML strings (one file or
one citation blob per row), emitting one row per MedlineCitation with the
exact fields the reference pulls:

- pmid, title, abstract, affiliation (first Affiliation text)
- authors: ForeName + "\\t" + LastName per author (the reference's
  author_key format, Author2PMID.groovy:80-83)
- mesh: DescriptorName text plus the GPath-concatenated QualifierName
  text per heading, added UNCONDITIONALLY (Author2PMID.groovy:90-95:
  Groovy's ``m.QualifierName.text()`` concatenates all matching nodes and
  returns "" when none match — so a qualifier-less heading contributes an
  empty string and a multi-qualifier heading ONE joined string; replicated
  verbatim because it changes meshscore Jaccard denominators/intersections)

Feed the output straight to ``canonicalize.author_records_from_raw`` —
raw XML to author entities with no hand-built intermediate.

Scale: the XML parse is per-row and stateless — embarrassingly parallel,
no shuffle; stdlib ElementTree, no external parser.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

MEDLINE_ARTICLES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("abstract", StringType(), True),
        StructField("authors", ArrayType(StringType()), True),
        StructField("mesh", ArrayType(StringType()), True),
        StructField("affiliation", StringType(), True),
    ]
)


def _text(elem, path: str) -> str:
    found = elem.find(path)
    return "".join(found.itertext()) if found is not None else ""


def parse_medline_xml_text(xml_text: str) -> list[dict]:
    """One XML document (possibly many MedlineCitation elements) -> one dict
    per citation. Pure function (unit-testable without Spark); malformed
    documents yield []."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    cites = root.iter("MedlineCitation") if root.tag != "MedlineCitation" else [root]
    out: list[dict] = []
    for cite in cites:
        pmid = _text(cite, "PMID")
        if not pmid:
            continue
        authors: list[str] = []
        for a in cite.findall(".//AuthorList/Author"):
            ln = _text(a, "LastName")
            fn = _text(a, "ForeName")
            # the reference's author key: initials + "\t" + lastname
            # (Author2PMID.groovy:80-82)
            authors.append(f"{fn}\t{ln}")
        mesh: list[str] = []
        for m in cite.findall(".//MeshHeadingList/MeshHeading"):
            # reference quirk (Author2PMID.groovy:90-95): descriptor text,
            # then QualifierName.text() — GPath concatenation of ALL
            # qualifier nodes, "" when the heading has none — added
            # unconditionally
            mesh.append("".join(t for d in m.findall("DescriptorName")
                                for t in d.itertext()))
            mesh.append("".join(t for q in m.findall("QualifierName")
                                for t in q.itertext()))
        out.append(
            {
                "doc_id": pmid,
                "title": _text(cite, ".//Article/ArticleTitle"),
                "abstract": _text(cite, ".//Article/Abstract/AbstractText"),
                "authors": authors,
                "mesh": mesh,
                "affiliation": _text(cite, ".//Article/Affiliation"),
            }
        )
    return out


def medline_articles(xml_df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """DataFrame of raw XML strings -> one row per MedlineCitation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for xml_text in pdf[xml_col]:
                if xml_text:
                    rows.extend(parse_medline_xml_text(xml_text))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "title", "abstract", "authors", "mesh", "affiliation",
                ],
            )

    return xml_df.select(xml_col).mapInPandas(run, schema=MEDLINE_ARTICLES)
