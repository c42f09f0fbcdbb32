"""Measure the pure-Python media decode budget: pixels/second per core for
each decoder tier, so the "thumbnail-grade" boundary in COVERAGE/PLANS is a
number rather than an adjective.

Run: python scripts/media_decode_budget.py  (no Spark; single core — the
mapInPandas fan-out multiplies these numbers by the core count, nothing
else). Payloads are constructed with the same independent encoders the test
suite verifies the decoders against (tests/test_jpeg.py encode_jpeg,
tests/test_multimodal.py _encode_gif), so the measurement exercises the real
bit-parsing paths end to end.
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from pmcanalysis_spark.multimodal import (  # noqa: E402
    decode_gif_pixels,
    decode_png_pixels,
    decode_pixels,
)
from pmcanalysis_spark.jpeg import decode_jpeg_pixels  # noqa: E402


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + zlib.crc32(tag + body).to_bytes(4, "big")
    )


def make_png(w: int, h: int, filter_type: int = 4) -> bytes:
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    raw = bytearray()
    for y in range(h):
        raw.append(filter_type if y else 0)  # row 0 must use filter 0 refs
        row = px[y].tobytes()
        if filter_type == 0 or y == 0:
            raw += row
        else:  # store the raw row under the chosen filter (encode inverse)
            prev = px[y - 1].reshape(-1)
            cur = px[y].reshape(-1)
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3].astype(np.int32)])
            upl = np.concatenate([np.zeros(3, np.int32), prev[:-3].astype(np.int32)])
            if filter_type == 2:
                raw += ((cur.astype(np.int32) - prev) % 256).astype(np.uint8).tobytes()
            elif filter_type == 4:
                p = left + prev.astype(np.int32) - upl
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upl)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upl)
                )
                raw += ((cur.astype(np.int32) - pred) % 256).astype(np.uint8).tobytes()
            else:
                raw += row
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    ), px


def make_bmp(w: int, h: int) -> bytes:
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += px[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    return bytes(header) + bytes(body), px


def make_jpeg(w: int, h: int) -> bytes:
    from test_jpeg import encode_jpeg  # tests-side independent encoder

    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, size=(h, w)).astype(float)
    q = np.ones(64) * 16
    return encode_jpeg([y], [q], [(1, 1)])


def make_gif(w: int, h: int) -> bytes:
    from test_multimodal import PAL4, _encode_gif

    rng = np.random.default_rng(13)
    idx = rng.integers(0, 4, size=(h, w))
    px = np.array(PAL4, dtype=np.uint8)[idx]
    return _encode_gif(idx, PAL4, grow=True), px


def bench(name: str, payload: bytes, decode, reps: int = 3, expect=None):
    px = decode(payload)
    assert px is not None, name
    if expect is not None:  # the measured path must also be the CORRECT path
        got = px if px.ndim == 3 else px[:, :, None]
        exp = expect if expect.ndim == 3 else expect[:, :, None]
        assert got.shape == exp.shape and (got == exp).all(), name
    h, w = px.shape[0], px.shape[1]
    best = min(
        (lambda t0: (decode(payload), time.perf_counter() - t0))(time.perf_counter())[1]
        for _ in range(reps)
    )
    rate = (w * h) / best
    print(
        f"{name:>14}: {w}x{h}  {best*1e3:8.1f} ms  {rate/1e6:8.3f} Mpx/s/core  "
        f"({len(payload)} bytes)"
    )
    return rate


def main() -> None:
    size = int(os.environ.get("DECODE_BUDGET_SIZE", "192"))
    print(f"pure-Python decode budget at {size}x{size} (single core):")
    for name, maker, dec in [
        ("BMP (numpy)", make_bmp, decode_pixels),
        ("PNG f0", lambda w, h: make_png(w, h, 0), decode_png_pixels),
        ("PNG f2 (Up)", lambda w, h: make_png(w, h, 2), decode_png_pixels),
        ("PNG f4 (Paeth)", lambda w, h: make_png(w, h, 4), decode_png_pixels),
        ("GIF LZW", make_gif, decode_gif_pixels),
    ]:
        payload, px = maker(size, size)
        bench(name, payload, dec, expect=px)
    bench("JPEG baseline", make_jpeg(size, size), decode_jpeg_pixels)


if __name__ == "__main__":
    main()
