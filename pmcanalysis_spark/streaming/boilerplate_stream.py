"""Streaming boilerplate-line detection (the streaming twin of
``dedup.common_lines``): as a crawl streams in, emit
each normalized line the FIRST time it has been seen in >= ``min_docs``
DISTINCT documents across all micro-batches so far.

``applyInPandasWithState`` keyed on the normalized line: per-key state is
the set of distinct doc ids seen so far, CAPPED at ``min_docs`` entries —
once the threshold is crossed the key is emitted exactly once and the
state collapses to an "emitted" marker, so a planet-hot line ("accept
cookies", 10^10 occurrences) holds min_docs strings of state and one
output row, never a membership list. State is therefore
O(distinct lines x min_docs), the same order as the batch operator's
common-line aggregate, and the group key (the line text) partitions the
state store exactly like the batch groupBy's exchange.

The emitted table is a deploy artifact for the cutting pass — the same
consume shape as ``decontam_stream``'s eval-gram set: a later (stream or
batch) pass joins it to strip flagged lines, while detection itself never
re-reads the corpus. Batch parity: on any micro-batch split of a corpus,
the emitted key set equals ``dedup.common_lines(corpus, min_docs)``
(pytest-pinned via line_dedup).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

COMMON_LINE = StructType(
    [
        StructField("line_key", StringType(), False),
    ]
)

_STATE = StructType(
    [
        StructField("ids", ArrayType(StringType()), True),
        StructField("emitted", BooleanType(), True),
    ]
)


def streaming_common_lines(
    docs_stream: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
) -> DataFrame:
    """docs stream -> (line_key) append stream: one row per normalized
    (lower+trim, non-empty) line at the moment its distinct-document count
    first reaches ``min_docs``, across all micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    occ = (
        docs_stream.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.explode(F.split(F.col(text_col), line_sep)).alias("line"),
        )
        .select("doc_id", F.lower(F.trim(F.col("line"))).alias("line_key"))
        .filter(F.col("line_key") != "")
    )

    def detect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ids: set[str] = set()
        emitted = False
        if state.exists:
            prev_ids, emitted = state.get
            if emitted:
                for _ in pdfs:  # already reported: drain and drop
                    pass
                return
            ids = set(prev_ids or [])
        for pdf in pdfs:
            if len(pdf) and len(ids) < min_docs:
                for d in pdf["doc_id"].unique():
                    ids.add(d)
                    if len(ids) >= min_docs:
                        break
        if len(ids) >= min_docs:
            state.update(([], True))
            yield pd.DataFrame({"line_key": [key[0]]})
        else:
            state.update((sorted(ids), False))

    return occ.groupBy("line_key").applyInPandasWithState(
        detect,
        outputStructType=COMMON_LINE,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
