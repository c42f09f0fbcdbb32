"""Stateful streaming exact-dedup (custom stateful operator, SURVEY.md §2.9
scale path: dedup a continuous crawl without re-reading the corpus).

``applyInPandasWithState`` keyed on the text hash: the first document seen
with a given hash is emitted; every later arrival (same micro-batch or any
later one) is dropped because the per-key state says the hash was seen.
State is one boolean per distinct hash — the streaming analog of
``dedup.exact_dedup``'s groupBy, with the shuffle replaced by the state
store partitioning on the same key.

Scale notes: state size is O(distinct docs) — at crawl scale use a TTL
(``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``)
so hashes expire after the window in which re-crawls are expected, or swap
the boolean for a count if you want dup statistics. The group key is a
128-bit md5: uniformly distributed, no skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

DEDUPED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("text_hash", StringType(), False),
    ]
)

_STATE = StructType([StructField("seen", StringType(), True)])


def streaming_exact_dedup(
    pages_stream: DataFrame, id_col: str = "url", text_col: str = "html"
) -> DataFrame:
    """pages stream -> (url, text_hash) with exactly one row per distinct
    text across ALL micro-batches (first occurrence wins; within a batch the
    min id wins, deterministically)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = pages_stream.select(
        F.col(id_col).alias("url"), F.md5(F.col(text_col)).alias("text_hash")
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # hash already emitted in an earlier batch: drain and drop
            for _ in pdfs:
                pass
            return
        best: str | None = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["url"].min()
                if best is None or m < best:
                    best = m
        if best is not None:
            state.update(("y",))
            yield pd.DataFrame({"url": [best], "text_hash": [key[0]]})

    return hashed.groupBy("text_hash").applyInPandasWithState(
        dedup,
        outputStructType=DEDUPED,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
