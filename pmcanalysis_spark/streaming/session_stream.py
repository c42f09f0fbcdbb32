"""Stateful streaming sessionization: the streaming twin of
``operators.events.sessionize`` — a continuous event stream gets gap-based
session ids without re-reading history.

``applyInPandasWithState`` keyed on user: state is (last event epoch-second,
current session seq), so each micro-batch only compares its arrivals against
one number per user. Within a batch, events sort by (ts, event_id) — the
same deterministic order as the batch operator — so splitting a stream at
ANY batch boundary yields bit-identical session assignments (tested).

Scale notes: state is O(users) × 16 bytes; the shuffle keys on user_id
(the natural partition, same as the batch window). A production deployment
adds ``GroupStateTimeout`` TTL exactly as in ``dedup_stream`` to retire
dormant users; late (out-of-order ACROSS batches) events would need a
watermark + re-emit protocol — out of scope here, as sessionization
upstreams normally deliver per-user ordered streams (the batch parity test
covers the in-order contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSIONS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("session_seq", LongType(), False),
        StructField("session_id", StringType(), False),
    ]
)

_STATE = StructType(
    [
        StructField("last_epoch", LongType(), True),
        StructField("seq", LongType(), True),
    ]
)


def streaming_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """events stream -> (event_id, user_id, ts, session_seq, session_id),
    cross-batch: a user's session numbering continues where the previous
    micro-batch left off. Equals the batch ``sessionize`` on the union of
    all batches for per-user in-order arrival (tested)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events_stream.select(
        F.col(id_col).alias("event_id").cast("long"),
        F.col(user_col).alias("user_id").cast("long"),
        F.col(ts_col).alias("ts"),
        F.unix_timestamp(F.col(ts_col)).alias("_epoch"),
    )

    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        last_epoch, seq = (state.get if state.exists else (None, 0))
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        seqs = []
        for ep in rows["_epoch"]:
            ep = int(ep)
            if last_epoch is None or ep - last_epoch > gap_seconds:
                seq = (seq or 0) + 1
            last_epoch = ep
            seqs.append(seq)
        state.update((last_epoch, int(seq)))
        yield pd.DataFrame(
            {
                "event_id": rows["event_id"].to_numpy(),
                "user_id": rows["user_id"].to_numpy(),
                "ts": rows["ts"],
                "session_seq": pd.Series(seqs, dtype="int64").to_numpy(),
                "session_id": [f"{user}#{s}" for s in seqs],
            }
        )

    return src.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=SESSIONS,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
