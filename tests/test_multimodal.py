from __future__ import annotations

from pmcanalysis_spark.multimodal import (
    MEDIA,
    extract_media_features,
    media_metadata,
)


def _media(spark):
    rows = [
        ("m1", "image", "image/png", 100, b"\x01" * 100),
        ("m2", "image", "image/png", 50, b"\x02" * 50),
        ("m3", "video", "video/mp4", 4096, b"\x03" * 4096),
    ]
    return spark.createDataFrame(rows, MEDIA)


def test_metadata_never_touches_payload(spark, tmp_path):
    path = str(tmp_path / "media")
    _media(spark).write.parquet(path)
    df = media_metadata(spark.read.parquet(path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # parquet scan's ReadSchema must exclude the binary payload column
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("payload" not in ln for ln in read_schema)
    rows = {r.kind: r.n for r in df.collect()}
    assert rows == {"image": 2, "video": 1}


def test_feature_extraction_batch_shape(spark):
    out = extract_media_features(_media(spark)).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["m1"]) == 1 and by_id["m1"][0].frame_idx == 0
    assert len(by_id["m3"]) >= 1  # video: >=1 sampled frame rows
    for r in out:
        assert r.width >= 16 and r.height >= 16
        assert len(r.features) <= 8


def test_fake_decode_is_deterministic(spark):
    a = sorted(map(str, extract_media_features(_media(spark)).collect()))
    b = sorted(map(str, extract_media_features(_media(spark)).collect()))
    assert a == b
