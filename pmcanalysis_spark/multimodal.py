"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode is REAL with zero codec libraries across all three modalities:
images — 24-bit BMP, binary PGM/PPM, 8-bit non-interlaced PNG (stdlib zlib
inflate + scanline unfilter, all color types), baseline JPEG (pure-numpy
Huffman + dequant + IDCT + chroma upsample, jpeg.py; progressive JPEGs fall
back to real header dims) and GIF (full LZW + interlace + palettes);
audio — RIFF/WAVE PCM 8/16/32-bit and
IEEE-float-32 (duration/RMS/peak/zero-crossing features); video —
Motion-JPEG AVI frame sampling (RIFF chunk walk, each frame through the
JPEG decoder). The ONE remaining stub is frame sampling for compressed
video codecs (MP4/H.264 — genuinely ffmpeg-blocked; clearly marked, raises
NotImplementedError unless the deterministic fake is enabled). Everything
Spark-side is real and tested: schemas, partitioning, the mapInPandas batch
shape, and the metadata fast-path that never touches the payload bytes.

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

# Whether UNRECOGNIZED payloads get deterministic byte-derived fake features
# instead of raising. Default False: a production pipeline fed a format this
# module can't decode (e.g. WebP) must fail loudly, not emit garbage
# features. Tests that exercise the Spark plumbing with synthetic payloads
# opt in per call via ``extract_media_features(..., use_fake_decode=True)``.
USE_FAKE_DECODE = False

_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xCF + 1)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def _pnm_header(payload: bytes):
    """P5/P6 header -> (channels, width, height, maxval, data_offset) or
    None. Handles whitespace runs and '#' comments per the netpbm spec."""
    if payload[:2] not in (b"P5", b"P6"):
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    i, n, vals = 2, len(payload), []
    while len(vals) < 3 and i < n:
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        vals.append(int(payload[i:j]))
        i = j
    if len(vals) < 3 or i >= n:
        return None
    return channels, vals[0], vals[1], vals[2], i + 1  # one ws after maxval


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytes:
    """PNG scanline unfilter (spec §6): each row is 1 filter-type byte +
    ``stride`` filtered bytes; filters 0-4 (None/Sub/Up/Average/Paeth)
    reconstruct against the left/up/up-left neighbors.

    Filters 0 (None) and 2 (Up) have NO intra-row dependency, so those rows
    reconstruct as one numpy add over the whole row (~50x the byte loop —
    and they are what most encoders emit for photographic rows). Filters
    1/3/4 depend on the just-reconstructed left byte and stay sequential
    per byte — measured rates in PLANS.md "Media decode budget"; real bulk
    decode belongs to a codec library (the ``decoder=`` hook)."""
    import numpy as np

    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        rs = y * stride
        ps = rs - stride
        if ft == 0:
            out[rs : rs + stride] = raw[pos : pos + stride]
            pos += stride
            continue
        if ft == 2:
            row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos)
            if y > 0:
                prev = np.frombuffer(
                    bytes(out[ps : ps + stride]), dtype=np.uint8
                )
                out[rs : rs + stride] = (row + prev).tobytes()  # uint8 wraps
            else:
                out[rs : rs + stride] = row.tobytes()
            pos += stride
            continue
        for x in range(stride):
            v = raw[pos + x]
            a = out[rs + x - bpp] if x >= bpp else 0
            b = out[ps + x] if y > 0 else 0
            if ft == 1:
                v = (v + a) & 0xFF
            elif ft == 3:
                v = (v + ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                c = out[ps + x - bpp] if (y > 0 and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                v = (v + (a if pa <= pb and pa <= pc else b if pb <= pc else c)) & 0xFF
            out[rs + x] = v
        pos += stride
    return bytes(out)


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> raw channels


def decode_png_pixels(payload: bytes):
    """REAL PNG pixel decode with nothing but stdlib zlib + the scanline
    unfilter above (no codec library): 8-bit depth, color types 0/2/3/4/6,
    non-interlaced. Palette images map through PLTE to RGB; alpha channels
    are dropped (gray+alpha -> gray, RGBA -> RGB) so every caller sees 1- or
    3-channel uint8 like the BMP/PNM decoders. Returns None for PNGs this
    subset doesn't cover (16-bit, interlaced) or malformed payloads."""
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(payload)
    ihdr = plte = None
    idat = bytearray()
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8:13]
    ch = _PNG_CHANNELS.get(color)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or ch is None:
        return None
    if w <= 0 or h <= 0:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    flat = np.frombuffer(
        _png_unfilter(raw, h, stride, ch), dtype=np.uint8
    ).reshape(h, w, ch)
    if color == 3:  # palette -> RGB
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if flat.max() >= len(pal):
            return None
        return pal[flat[:, :, 0]].copy()
    if color == 4:  # gray+alpha -> gray
        return flat[:, :, :1].copy()
    if color == 6:  # RGBA -> RGB
        return flat[:, :, :3].copy()
    return flat.copy()


def decode_gif_pixels(payload: bytes):
    """REAL GIF decode (pure stdlib + numpy): GIF87a/89a, global or local
    color table, full LZW decompression (variable code width, CLEAR/END,
    the KwKwK case), interlaced or sequential row order; extensions are
    skipped, and for animated GIFs the FIRST frame renders (composited at
    its offset on a canvas of the logical screen, background index 0).
    Returns (h, w, 3) uint8 RGB or None on malformed/truncated payloads."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if len(payload) < pos + 3 * n:  # truncated color table
            return None
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    if sw <= 0 or sh <= 0:
        return None
    try:
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:  # trailer
                return None
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if b != 0x2C:  # not an image descriptor
                return None
            left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
            top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                if len(payload) < pos + 3 * n:
                    return None
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if ct is None or iw <= 0 or ih <= 0:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(bytes(data), min_code, iw * ih)
            if idx is None or (idx >= len(ct)).any():
                return None
            img = ct[idx].reshape(ih, iw, 3)
            if iflags & 0x40:  # interlaced: 4-pass row order
                out = np.empty_like(img)
                order = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                for src, dst in enumerate(order):
                    out[dst] = img[src]
                img = out
            canvas = np.tile(ct[0], (sh, sw, 1)).astype(np.uint8)
            canvas[top : top + ih, left : left + iw] = img[
                : max(0, sh - top), : max(0, sw - left)
            ]
            return canvas
    except IndexError:
        return None
    return None


def _gif_lzw_decode(data: bytes, min_code: int, n_pixels: int):
    """GIF-flavor LZW: LSB-first bit packing, CLEAR resets the dictionary,
    code width grows when the dictionary fills its width (cap 12 bits)."""
    import numpy as np

    if not (2 <= min_code <= 11):
        return None
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.int64)
    filled = 0
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        return {i: (i,) for i in range(clear)}, clear + 2, min_code + 1

    table, next_code, width = reset()
    prev: tuple | None = None
    while filled < n_pixels:
        if bitpos + width > nbits:
            return None
        # LSB-first read
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            return None  # ended before n_pixels decoded
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            return None
        take = min(len(entry), n_pixels - filled)
        out[filled : filled + take] = entry[:take]
        filled += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_pixels(payload: bytes):
    """REAL pixel decode (pure stdlib + numpy), no codec library: 24-bit
    uncompressed BMP, binary PGM/PPM, 8-bit non-interlaced PNG (zlib
    inflate + scanline unfilter), baseline JPEG (Huffman + IDCT,
    jpeg.decode_jpeg_pixels) and GIF (LZW + interlace). Returns a
    (height, width, channels) uint8 array, or None outside those subsets
    (progressive JPEG falls back to real header dims)."""
    import numpy as np

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(payload)

    if len(payload) >= 54 and payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h_raw = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0 or w <= 0 or h_raw == 0:
            return None
        h = abs(h_raw)
        row_bytes = (w * 3 + 3) // 4 * 4
        if off + row_bytes * h > len(payload):
            return None
        buf = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=off)
        rows = buf.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if h_raw > 0:  # bottom-up storage
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    hdr = _pnm_header(payload)
    if hdr is not None:
        ch, w, h, maxval, off = hdr
        if maxval > 255 or w <= 0 or h <= 0:
            return None
        need = w * h * ch
        if off + need > len(payload):
            return None
        buf = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
        return buf.reshape(h, w, ch).copy()
    return None


def resize_nearest(pixels, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (h, w, c) uint8 array — the real
    resize kernel (index sampling, no interpolation library needed)."""
    import numpy as np

    h, w = pixels.shape[0], pixels.shape[1]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ri][:, ci]


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
    if len(payload) >= 26 and payload[:2] == b"BM":
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = abs(int.from_bytes(payload[22:26], "little", signed=True))
        return (w, h) if w > 0 and h > 0 else None
    if payload[:2] in (b"P5", b"P6"):
        hdr = _pnm_header(payload)
        if hdr is not None:
            return hdr[1], hdr[2]
        return None
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


def decode_wav_samples(payload: bytes):
    """REAL audio decode (pure stdlib + numpy): RIFF/WAVE with PCM
    (8/16/32-bit int) or IEEE-float-32 samples -> (samples, channels)
    float64 array in [-1, 1] plus the sample rate: ((n, ch) array, rate).
    Returns None outside that subset (compressed codecs need a library)."""
    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1 or rate <= 0:
        return None
    itemsize = bits // 8
    if itemsize:  # truncate a ragged data chunk to whole samples
        data = data[: len(data) - len(data) % itemsize]
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        return None
    usable = (len(x) // channels) * channels
    if usable == 0:
        return None
    return x[:usable].reshape(-1, channels), rate


def _decode_audio(payload: bytes) -> tuple[int, int, list[float]] | None:
    """Audio feature kernel: (n_samples, channels, 8 features) — duration,
    RMS, peak, zero-crossing rate, per-channel means (up to 2), DC offset,
    sample rate (scaled). None when the payload is not decodable WAV."""
    decoded = decode_wav_samples(payload)
    if decoded is None:
        return None
    import numpy as np

    x, rate = decoded
    n, ch = x.shape
    mono = x.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono)).astype(np.float64)))) if n > 1 else 0.0
    feats = [
        float(n / rate),                       # duration seconds
        float(np.sqrt((mono * mono).mean())),  # RMS
        float(np.abs(x).max()),                # peak
        zc,                                    # zero-crossing rate
        float(x[:, 0].mean()),
        float(x[:, 1].mean()) if ch > 1 else float(x[:, 0].mean()),
        float(mono.mean()),                    # DC offset
        float(rate) / 48000.0,
    ]
    return n, ch, feats


def _decode_image(
    payload: bytes, use_fake_decode: bool | None = None
) -> tuple[int, int, list[float]]:
    """Decode tiering, most-real first:

    1. BMP / PGM / PPM / PNG (8-bit non-interlaced) / baseline JPEG / GIF:
       REAL pixels (decode_pixels) -> real width/height and real
       statistical features (global + per-channel means, std, aspect).
    2. Progressive JPEG / exotic PNGs: REAL width/height (header parse);
       pixel features there are a deterministic byte-derived fake
       (clearly not semantic).
    3. Unrecognized payloads: full fake iff ``use_fake_decode`` (defaults to
       the module's USE_FAKE_DECODE, i.e. False), else raises.
    """
    px = decode_pixels(payload)
    if px is not None:
        import numpy as np

        h, w = int(px.shape[0]), int(px.shape[1])
        flat = px.astype("float64") / 255.0
        chan = flat.mean(axis=(0, 1))
        chan3 = list(chan) if chan.shape[0] == 3 else [float(chan[0])] * 3
        feats = [
            float(flat.mean()),
            float(flat.std()),
            float(chan3[0]),
            float(chan3[1]),
            float(chan3[2]),
            float(flat.min()),
            float(flat.max()),
            float(w / (w + h)),
        ]
        return w, h, feats
    dims = parse_image_dims(payload)
    feats = [float((b % 17)) / 16.0 for b in payload[:8]]
    if dims is not None:
        return dims[0], dims[1], feats
    if not (USE_FAKE_DECODE if use_fake_decode is None else use_fake_decode):
        raise NotImplementedError("pixel decode requires a codec library")
    hsh = sum(payload[:16]) if payload else 0
    width, height = 16 + hsh % 64, 16 + (hsh // 64) % 64
    return width, height, feats


def _avi_mjpeg_frames(payload: bytes) -> list[bytes] | None:
    """REAL frame extraction for Motion-JPEG in an AVI container (pure
    stdlib): walk the RIFF chunk tree, collect every video-stream chunk
    ('##dc'/'##db') whose body starts with a JPEG SOI — each frame then
    decodes through jpeg.decode_jpeg_pixels like any still. Returns None
    when the payload is not a RIFF AVI (or holds no JPEG frames)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid == b"LIST" and sz >= 4:
                walk(body + 4, min(body + sz, end))
            elif (
                cid[2:4] in (b"dc", b"db")
                and sz >= 2
                and payload[body : body + 2] == b"\xff\xd8"
            ):
                frames.append(payload[body : body + sz])
            pos = body + sz + (sz & 1)  # word alignment

    walk(12, len(payload))
    return frames or None


def _sample_frames(
    payload: bytes, every: int, use_fake_decode: bool | None = None
) -> list[bytes]:
    """Frame sampler: REAL for Motion-JPEG AVI (every ``every``-th frame of
    the RIFF walk above); other containers (MP4/H.264...) genuinely need
    ffmpeg and remain the one STUB in this module."""
    real = _avi_mjpeg_frames(payload)
    if real is not None:
        return real[:: max(every, 1)]
    if not (USE_FAKE_DECODE if use_fake_decode is None else use_fake_decode):
        raise NotImplementedError(
            "non-MJPEG-AVI video frame sampling requires ffmpeg"
        )
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


def extract_media_features(
    media: DataFrame,
    frame_every: int = 10,
    decoder=None,
    use_fake_decode: bool | None = None,
) -> DataFrame:
    """Decode / feature-extract / frame-sample as one Arrow-batched pass.

    Images yield one row (frame_idx=0); videos yield one row per sampled
    frame (UDTF shape). Batch memory is bounded by Arrow batch size x max
    payload — set spark.sql.execution.arrow.maxRecordsPerBatch down for
    large media.

    ``decoder``: optional pluggable codec hook for production deployments
    with real codec libraries (libjpeg-turbo, ffmpeg, ...). Called FIRST for
    every row as ``decoder(kind, payload, frame_every)`` inside the Arrow
    worker (must be picklable; payload is ``bytes``). Return a list of
    ``(frame_idx, width, height, features)`` tuples to take the row, or
    ``None`` to fall through to the built-in pure-Python tier — so a
    deployment can route e.g. only JPEG/MP4 through the fast codec while
    everything else keeps the codec-free default. Schema and batch shape are
    identical on both paths (tested).

    ``use_fake_decode``: per-call override of the module's USE_FAKE_DECODE
    (default False — unrecognized payloads raise rather than silently
    yielding byte-derived fake features).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "width", "height", "features")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if decoder is not None:
                    rows = decoder(kind, payload, frame_every)
                    if rows is not None:
                        for fi, w, h, feats in rows:
                            out["media_id"].append(mid)
                            out["frame_idx"].append(fi)
                            out["width"].append(w)
                            out["height"].append(h)
                            out["features"].append(feats)
                        continue
                if kind == "audio":
                    a = _decode_audio(payload)
                    if a is not None:
                        # REAL audio stats: width = n_samples, height =
                        # channels (documented overload of the image slots)
                        n, ch, feats = a
                        out["media_id"].append(mid)
                        out["frame_idx"].append(0)
                        out["width"].append(n)
                        out["height"].append(ch)
                        out["features"].append(feats)
                        continue
                if kind == "video":
                    frames = _sample_frames(payload, frame_every, use_fake_decode)
                else:
                    frames = [payload]
                for fi, frame in enumerate(frames):
                    w, h, feats = _decode_image(frame, use_fake_decode)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=MEDIA_FEATURES
    )


THUMBNAILS = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("pixels", BinaryType(), False),  # raw out_h*out_w*c RGB
    ]
)


def decode_and_resize(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """REAL decode+resize pass for codec-free formats (BMP/PGM/PPM):
    nearest-neighbor thumbnails as raw channel-interleaved bytes. Rows whose
    payloads need a codec library are dropped (count them against
    media_metadata to monitor coverage). Arrow-batched; the binary payload
    column is the only wide column crossing Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, ws, hs, cs, px = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pixels = decode_pixels(bytes(payload) if payload is not None else b"")
                if pixels is None:
                    continue
                thumb = resize_nearest(pixels, out_h, out_w)
                mids.append(mid)
                ws.append(out_w)
                hs.append(out_h)
                cs.append(int(thumb.shape[2]))
                px.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="object"),
                    "out_w": pd.Series(ws, dtype="int32"),
                    "out_h": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(cs, dtype="int32"),
                    "pixels": pd.Series(px, dtype="object"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=THUMBNAILS)


def image_ahash(media: DataFrame, size: int = 8) -> DataFrame:
    """(media_id, ahash bigint): average-hash perceptual fingerprint —
    decode (REAL, codec-free formats), luma, ``size``×``size`` thumbnail
    via the nearest-neighbor kernel, then bit (y·size+x) = 1 iff the cell
    is STRICTLY above the thumbnail's mean luma (strict: a flat image —
    all cells == mean — hashes to 0 instead of all-ones). Packed LSB-first
    row-major into one signed 64-bit (size=8 ⇒ 64 bits). The image twin of
    ``dedup.simhash64``: near-identical images (recompression, slight
    crop/brightness) land within a few bits, and
    ``dedup.hamming_pairs(..., n_bits=size*size)`` finds the pairs with
    the same banded plan as text SimHash. Undecodable payloads are
    dropped (count vs media_metadata for coverage). ONE Arrow-batched
    crossing; downstream banding/joins are pure column algebra."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pixels = decode_pixels(bytes(payload) if payload is not None else b"")
                if pixels is None:
                    continue
                luma = pixels.astype("float64").mean(axis=2)
                thumb = resize_nearest(luma[:, :, None], size, size)[:, :, 0]
                bits = (thumb > thumb.mean()).astype(np.uint64).ravel()
                h = 0
                for i, bval in enumerate(bits):
                    if bval:
                        h |= 1 << i
                if h >= 1 << 63:  # wrap to signed 64-bit
                    h -= 1 << 64
                mids.append(mid)
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="object"),
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id string, ahash long"
    )
