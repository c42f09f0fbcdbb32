"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode/feature-extraction needs image/audio libs absent from this
container, so the decode kernels are STUBS behind ``_decode_*`` (clearly
marked; raise NotImplementedError unless the deterministic fake is enabled).
Everything Spark-side is real and tested: schemas, partitioning, the
mapInPandas batch shape, and the metadata fast-path that never touches the
payload bytes.

Design for 100 TB of media: the payload column lives in its own parquet/
Iceberg files (column pruning means metadata queries read ZERO payload
bytes); decode fans out as mapInPandas over row groups; frame-sampling emits
multiple rows per input (UDTF shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

# deterministic fake decode for tests; real kernels would go here
USE_FAKE_DECODE = True


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB: real implementation needs PIL/opencv (not in this container).

    The deterministic fake derives shape/features from the payload bytes so
    tests pin the batch plumbing end-to-end.
    """
    if not USE_FAKE_DECODE:
        raise NotImplementedError("image decode requires PIL/opencv")
    h = sum(payload[:16]) if payload else 0
    width, height = 16 + h % 64, 16 + (h // 64) % 64
    feats = [float((b % 17)) / 16.0 for b in payload[:8]]
    return width, height, feats


def _sample_frames(payload: bytes, every: int) -> list[bytes]:
    """STUB frame sampler: real implementation needs ffmpeg bindings."""
    if not USE_FAKE_DECODE:
        raise NotImplementedError("video frame sampling requires ffmpeg")
    n = max(1, (len(payload) // 1024) // max(every, 1))
    return [payload[i * 16 : i * 16 + 16] for i in range(min(n, 4))]


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata fast path: never reads ``payload`` — check the scan's
    ReadSchema to confirm the binary column is pruned."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("n_bytes").alias("avg_bytes"),
    )


def extract_media_features(media: DataFrame, frame_every: int = 10) -> DataFrame:
    """Decode / feature-extract / frame-sample as one Arrow-batched pass.

    Images yield one row (frame_idx=0); videos yield one row per sampled
    frame (UDTF shape). Batch memory is bounded by Arrow batch size x max
    payload — set spark.sql.execution.arrow.maxRecordsPerBatch down for
    large media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "width", "height", "features")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if kind == "video":
                    frames = _sample_frames(payload, frame_every)
                else:
                    frames = [payload]
                for fi, frame in enumerate(frames):
                    w, h, feats = _decode_image(frame)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=MEDIA_FEATURES
    )
