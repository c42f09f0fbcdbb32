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


def _tiny_png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )


def _tiny_jpeg(w, h):
    # SOI, APP0 (JFIF stub), SOF0, EOI — enough for a header walk
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _tiny_gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def test_parse_image_dims_real_headers():
    from pmcanalysis_spark.multimodal import parse_image_dims

    assert parse_image_dims(_tiny_png(640, 480)) == (640, 480)
    assert parse_image_dims(_tiny_jpeg(1024, 768)) == (1024, 768)
    assert parse_image_dims(_tiny_gif(320, 200)) == (320, 200)
    assert parse_image_dims(b"not an image") is None
    assert parse_image_dims(b"") is None
    # truncated PNG header must not crash
    assert parse_image_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None


def test_extract_media_features_real_dims(spark):
    """Real PNG/JPEG bytes through the Spark batch path yield the true
    width/height (the decode is no longer fake for recognized formats)."""
    from pmcanalysis_spark.multimodal import MEDIA, extract_media_features

    rows = [
        ("m1", "image", "image/png", 50, bytearray(_tiny_png(640, 480))),
        ("m2", "image", "image/jpeg", 50, bytearray(_tiny_jpeg(800, 600))),
    ]
    df = spark.createDataFrame(rows, MEDIA)
    got = {r["media_id"]: (r["width"], r["height"])
           for r in extract_media_features(df).collect()}
    assert got == {"m1": (640, 480), "m2": (800, 600)}
