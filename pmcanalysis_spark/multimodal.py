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

# deterministic fake decode for tests; real pixel decode would go here
USE_FAKE_DECODE = True

_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xCF + 1)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def parse_image_dims(payload: bytes) -> tuple[int, int] | None:
    """REAL header parse (pure stdlib, no PIL): (width, height) for
    PNG (IHDR), GIF87a/89a (logical screen descriptor) and JPEG (first SOFn
    segment); None when the payload is not a recognized image format.
    """
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is required to be the first chunk: length(4) type(4) data
        if payload[12:16] == b"IHDR":
            return (
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"),
            )
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # walk the marker segments to the first start-of-frame
        i = 2
        n = len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None  # desynced
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF_MARKERS:
                # segment: len(2) precision(1) height(2) width(2)
                if i + 9 > n:
                    return None
                return (
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            i += 2 + seg_len
        return None
    return None


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Width/height are REAL (header parse above) whenever the payload is an
    actual PNG/GIF/JPEG. Pixel-level feature vectors still need PIL/opencv
    (absent from this container): for recognized images the feature slot is
    a deterministic byte-derived fake (clearly not a semantic embedding);
    for unrecognized payloads the whole decode falls back to the fake iff
    USE_FAKE_DECODE, else raises.
    """
    dims = parse_image_dims(payload)
    feats = [float((b % 17)) / 16.0 for b in payload[:8]]
    if dims is not None:
        return dims[0], dims[1], feats
    if not USE_FAKE_DECODE:
        raise NotImplementedError("pixel decode requires PIL/opencv")
    h = sum(payload[:16]) if payload else 0
    width, height = 16 + h % 64, 16 + (h // 64) % 64
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
