"""Baseline JPEG decoder in pure stdlib + numpy (no codec library).

Scope (documented subset, returns None outside it): baseline sequential DCT
(SOF0), 8-bit samples, Huffman coding, single interleaved scan, grayscale or
3-component YCbCr with sampling 4:4:4 (1x1), 4:2:2 (2x1) or 4:2:0 (2x2),
restart markers supported. Progressive (SOF2), arithmetic coding and 12-bit
precision are out of scope.

Pipeline per the spec (ITU-T T.81): segment parse (DQT/DHT/SOF0/SOS/DRI) ->
entropy-decode MCUs (canonical Huffman, DC prediction, AC run-length,
EXTEND) -> dequantize -> de-zigzag -> 2-D IDCT (one 8x8 orthonormal DCT
basis matmul pair per block — numpy, no per-pixel Python) -> plane
assembly -> chroma upsample (sample replication) -> YCbCr->RGB (JFIF
full-range BT.601) -> clip to uint8.

Used by multimodal.decode_pixels, which makes JPEG payloads take the REAL
pixel-feature path; the video frame sampler remains the one honestly
codec-blocked stub.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# orthonormal 8-point DCT-II basis: B[k, x] = c(k) * cos((2x+1) k pi / 16)
_B = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _x in range(8):
        _B[_k, _x] = _c * np.cos((2 * _x + 1) * _k * np.pi / 16)


def _idct2(coef: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of an 8x8 coefficient block (orthonormal)."""
    return _B.T @ coef @ _B


class _Huff:
    """Canonical Huffman table from the DHT (BITS, HUFFVAL) spec form."""

    __slots__ = ("lut",)

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 byte-stuffing removed, stops at
    any marker; RSTn consumed by ``restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return False
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 < n and d[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed 0xFF
            else:
                return False  # a real marker: segment over
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        d, n = self.data, len(self.data)
        while self.pos + 1 < n and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.1.2): map t low bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes):
    """Baseline JPEG -> (h, w, 1|3) uint8 array, or None when the payload is
    not a JPEG or falls outside the supported subset."""
    try:
        return _decode(payload)
    except (EOFError, ValueError, IndexError, KeyError):
        return None


def _decode(payload: bytes):
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (h, w, comps) comps: (cid, hs, vs, tq)
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 3 < n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            return None  # reached EOI without a scan
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    return None  # 16-bit tables out of scope
                qt[tq] = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                    np.int32
                )
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                return None  # 12-bit precision out of scope
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                o = 6 + 3 * c
                comps.append((seg[o], seg[o + 1] >> 4, seg[o + 1] & 0xF, seg[o + 2]))
            frame = (h, w, comps)
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive/arithmetic/other frame types
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0xF)
            return _decode_scan(
                payload, i + 2 + seg_len, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seg_len
    return None


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    if h <= 0 or w <= 0 or len(comps) not in (1, 3):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hs, vs, _tq in comps:
        if hs not in (1, 2) or vs not in (1, 2):
            return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)

    br = _BitReader(payload, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                dc_tab = huff_dc[scan[cid][0]]
                ac_tab = huff_ac[scan[cid][1]]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        t = br.decode(dc_tab)
                        diff = _extend(br.read_bits(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = br.decode(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        block = _idct2(coef.reshape(8, 8))
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # assemble: upsample each component to full MCU-grid resolution by
    # sample replication, then crop to (h, w)
    full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid] + 128.0  # level shift
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:full_h, :full_w][:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    Y, Cb, Cr = out_planes
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
