"""Baseline JPEG decoder: verified against a test-side encoder written
independently (direct-formula forward DCT, hand-built canonical Huffman
tables, explicit bit packing) — the decoder must invert it."""

from __future__ import annotations

import numpy as np

from pmcanalysis_spark.jpeg import decode_jpeg_pixels

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct2(block):
    """Direct-formula orthonormal forward DCT (independent of the decoder's
    basis-matrix implementation)."""
    out = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else 0.5
        for v in range(8):
            cv = np.sqrt(0.125) if v == 0 else 0.5
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = cu * cv * s
    return out


def _idct2_direct(coef):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = np.sqrt(0.125) if u == 0 else 0.5
                for v in range(8):
                    cv = np.sqrt(0.125) if v == 0 else 0.5
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)  # pad with 1s


def _canonical(symbols, length):
    """All symbols at one code length: bits list + canonical code map."""
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {}
    code = 0
    for s in symbols:
        codes[s] = (length, code)
        code += 1
    return bits, codes


def _cat(v):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t


def _enc_val(v, t):
    return v if v >= 0 else v + (1 << t) - 1


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(planes, q_tables, sampling, dri=0):
    """Minimal baseline encoder: ``planes`` = list of full-res component
    pixel arrays (component i stored at its OWN resolution), ``sampling`` =
    [(hs, vs), ...], one shared luminance-style Huffman pair per class.
    Returns JPEG bytes. Components use quant table i % len(q_tables)."""
    ncomp = len(planes)
    h, w = planes[0].shape
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized coefficient blocks per component, padded to the MCU grid
    comp_blocks = []
    for ci, (plane, (hs, vs)) in enumerate(zip(planes, sampling)):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded = np.zeros((ph, pw))
        sh, sw = plane.shape
        padded[:sh, :sw] = plane
        padded[sh:, :sw] = plane[sh - 1 : sh, :]
        padded[:, sw:] = padded[:, sw - 1 : sw]
        q = q_tables[ci % len(q_tables)]
        blocks = {}
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _fdct2(blk)
                qz = np.rint(coef.reshape(-1) / q.reshape(-1)).astype(int)
                blocks[(by, bx)] = [int(qz[z]) for z in ZIGZAG]
        comp_blocks.append(blocks)

    # entropy symbols needed
    dc_syms = sorted({_cat(0)} | set(range(12)))
    ac_syms = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
    dc_bits, dc_codes = _canonical(dc_syms, 6)
    ac_bits, ac_codes = _canonical(ac_syms, 9)

    wtr = _Writer()
    pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_blocks[ci][(my * vs + by, mx * hs + bx)]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        t = _cat(diff)
                        ln, code = dc_codes[t]
                        wtr.bits(code, ln)
                        if t:
                            wtr.bits(_enc_val(diff, t), t)
                        run = 0
                        for k in range(1, 64):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_codes[0xF0]
                                wtr.bits(code, ln)
                                run -= 16
                            s = _cat(v)
                            ln, code = ac_codes[(run << 4) | s]
                            wtr.bits(code, ln)
                            wtr.bits(_enc_val(v, s), s)
                            run = 0
                        if run:
                            ln, code = ac_codes[0x00]
                            wtr.bits(code, ln)
            mcu_count += 1
    wtr.flush()

    out = bytearray(b"\xff\xd8")
    for ti, q in enumerate(q_tables):
        qz = bytes(int(q.reshape(-1)[z]) for z in ZIGZAG)
        out += _seg(0xDB, bytes([ti]) + qz)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (sampling[ci][0] << 4) | sampling[ci][1], ci % len(q_tables)])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms))
    if dri:
        out += _seg(0xDD, dri.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


Q1 = np.ones((8, 8))


def test_gray_constant_block_exact():
    """DC-only block: IDCT is exactly constant, decode must be exact."""
    px = np.full((8, 8), 160.0)
    got = decode_jpeg_pixels(encode_jpeg([px], [Q1], [(1, 1)]))
    assert got is not None and got.shape == (8, 8, 1)
    assert np.array_equal(got[:, :, 0], np.full((8, 8), 160, dtype=np.uint8))


def test_gray_multiblock_roundtrip():
    """16x16 random gray: 4 blocks, DC prediction chains, AC runs/ZRL; with
    q=1 the quantization error is <= 0.5/coef, pixels within 2 levels."""
    rng = np.random.RandomState(5)
    px = rng.randint(40, 216, size=(16, 16)).astype(float)
    got = decode_jpeg_pixels(encode_jpeg([px], [Q1], [(1, 1)]))
    assert got is not None and got.shape == (16, 16, 1)
    assert np.max(np.abs(got[:, :, 0].astype(float) - px)) <= 2


def test_gray_nonmultiple_dims_cropped():
    rng = np.random.RandomState(6)
    px = rng.randint(40, 216, size=(10, 13)).astype(float)
    got = decode_jpeg_pixels(encode_jpeg([px], [Q1], [(1, 1)]))
    assert got is not None and got.shape == (10, 13, 1)
    assert np.max(np.abs(got[:, :, 0].astype(float) - px)) <= 2


def test_color_444_roundtrip():
    """3-component 4:4:4: YCbCr planes decode through the color transform;
    compare against the test's own direct-formula reconstruction."""
    rng = np.random.RandomState(7)
    Y = rng.randint(60, 200, size=(8, 8)).astype(float)
    Cb = rng.randint(100, 156, size=(8, 8)).astype(float)
    Cr = rng.randint(100, 156, size=(8, 8)).astype(float)
    got = decode_jpeg_pixels(encode_jpeg([Y, Cb, Cr], [Q1], [(1, 1)] * 3))
    assert got is not None and got.shape == (8, 8, 3)
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    exp = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255)
    assert np.max(np.abs(got.astype(float) - exp)) <= 4  # quantization noise


def test_color_420_subsampling():
    """4:2:0: Y at 16x16, chroma at 8x8 — constant chroma reconstructs
    exactly under sample replication."""
    rng = np.random.RandomState(8)
    Y = rng.randint(60, 200, size=(16, 16)).astype(float)
    Cb = np.full((8, 8), 140.0)
    Cr = np.full((8, 8), 120.0)
    got = decode_jpeg_pixels(
        encode_jpeg([Y, Cb, Cr], [Q1], [(2, 2), (1, 1), (1, 1)])
    )
    assert got is not None and got.shape == (16, 16, 3)
    r = Y + 1.402 * (120.0 - 128.0)
    exp_r = np.clip(np.rint(r), 0, 255)
    assert np.max(np.abs(got[:, :, 0].astype(float) - exp_r)) <= 3


def test_restart_markers():
    rng = np.random.RandomState(9)
    px = rng.randint(40, 216, size=(8, 32)).astype(float)  # 4 MCUs in a row
    got = decode_jpeg_pixels(encode_jpeg([px], [Q1], [(1, 1)], dri=1))
    assert got is not None
    assert np.max(np.abs(got[:, :, 0].astype(float) - px)) <= 2


def test_quant_table_applied():
    """A non-trivial quant table must dequantize: encode with q=4 for every
    coefficient; a constant 160 block has DC=256 -> quantized 64 -> decode
    must multiply back to exactly 160."""
    q4 = np.full((8, 8), 4.0)
    px = np.full((8, 8), 160.0)
    got = decode_jpeg_pixels(encode_jpeg([px], [q4], [(1, 1)]))
    assert got is not None
    assert np.array_equal(got[:, :, 0], np.full((8, 8), 160, dtype=np.uint8))


def test_out_of_scope_returns_none():
    assert decode_jpeg_pixels(b"not a jpeg") is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    # progressive frame marker (SOF2) -> unsupported
    prog = b"\xff\xd8" + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])) + b"\xff\xd9"
    assert decode_jpeg_pixels(prog) is None


def test_idct_matches_direct_formula():
    """The decoder's basis-matrix IDCT equals the direct O(N^4) formula."""
    from pmcanalysis_spark.jpeg import _idct2

    rng = np.random.RandomState(10)
    coef = rng.randn(8, 8) * 50
    assert np.max(np.abs(_idct2(coef) - _idct2_direct(coef))) < 1e-9


def test_multimodal_routes_jpeg_to_real_decode(spark):
    """A baseline JPEG through the Spark feature path yields REAL pixel
    statistics (pure-red image -> channel means (1, 0, 0))."""
    from pmcanalysis_spark.multimodal import MEDIA, decode_pixels, extract_media_features

    Y = np.full((8, 8), 76.0)     # BT.601 luma of pure red ~76.245
    Cb = np.full((8, 8), 85.0)    # chroma of pure red ~84.97
    Cr = np.full((8, 8), 255.0)
    payload = encode_jpeg([Y, Cb, Cr], [Q1], [(1, 1)] * 3)
    px = decode_pixels(payload)
    assert px is not None and px.shape == (8, 8, 3)
    assert px[0, 0, 0] > 240 and px[0, 0, 1] < 15 and px[0, 0, 2] < 15

    df = spark.createDataFrame(
        [("j1", "image", "image/jpeg", len(payload), bytearray(payload))], MEDIA
    )
    [r] = extract_media_features(df).collect()
    assert (r["width"], r["height"]) == (8, 8)
    f = list(r["features"])
    assert f[2] > 0.94 and f[3] < 0.06 and f[4] < 0.06  # real channel means
