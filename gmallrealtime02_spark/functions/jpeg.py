"""Pure-Python BASELINE JPEG codec — the last external-codec
dependency for scraped-corpus media columns, removed (round-10 verdict
item 7: "decide-or-document"; this is the decide branch).

Decoder scope (reject-clean outside it, null rows never task
failures): baseline sequential DCT (SOF0), 8-bit samples, Huffman
entropy coding, grayscale (1 component, non-interleaved per T.81 A.2)
or YCbCr (3 components) at sampling factors up to 2 — 4:4:4, 4:2:2
and 4:2:0, the forms real scraped JPEGs use; subsampled chroma
upsamples by sample replication.  Progressive (SOF2), arithmetic
coding, 12-bit, factors > 2, and restart intervals return None.

JPEG is LOSSY, so the PNG-style "predict the decode from the encode
input" oracle only transfers where the transform chain is EXACT.  The
synthetic encoder exploits the one case where it is: a DC-ONLY block
(all AC coefficients zero) under an all-ones quantization table
inverse-transforms to a mathematically FLAT block — IDCT of
F(0,0) = 8·(s−128) is s−128 in exact IEEE arithmetic (integers ≤ 2^10
scaled by powers of two), so the decoded samples equal the encoder's
input byte exactly and a DuckDB oracle can recompute the statistics
with codepoint arithmetic, no JPEG parser.  The decoder still runs the
REAL pipeline on REAL entropy-coded bytes: marker walk, DQT/DHT/SOF0/
SOS parsing, bit-stuffed Huffman stream, DC prediction, run-length AC,
zigzag, dequantization, separable float IDCT, level shift + clamp.
Full AC-coefficient blocks are pinned in pytest against an in-test
reference IDCT (and against Pillow where it ships).

Reference intent: the multimodal decode family of SURVEY §2.9 —
image/audio/video as opaque binary columns with REAL decoders where
zero-dependency ones are possible (BMP, PNG, now baseline JPEG).
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.3 typical Huffman tables (public spec constants).
# (bits[1..16] counts, then symbols in code order)
DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# separable IDCT basis: COS[u][x] = C(u)/2 * cos((2x+1)uπ/16) — plain
# IEEE doubles, deterministic everywhere
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def idct_2d(coef: list[int | float]) -> list[float]:
    """Separable 2D inverse DCT of one 8x8 block (row-major, already
    dequantized, natural order).  Two 1-D passes over the shared basis
    table; exact for DC-only blocks (pure scaling by 1/8)."""
    tmp = [0.0] * 64
    for y in range(8):  # columns first: tmp[y][x] = sum_v coef[v][x] Cv(y)
        for x in range(8):
            s = 0.0
            for v in range(8):
                s += _COS[v][y] * coef[v * 8 + x]
            tmp[y * 8 + x] = s
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _COS[u][x] * tmp[y * 8 + u]
            out[y * 8 + x] = s
    return out


class _Huff:
    """Canonical Huffman table: (length, code) -> symbol, built from
    the DHT bits/vals exactly as T.81 C.2 assigns codes."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln]):
                self.lookup[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with
    0xFF00 byte-unstuffing; raises ValueError at markers/EOF."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("bitstream exhausted")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt != 0x00:
                raise ValueError("marker inside entropy stream")
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if byte == 0xFF:
                self.pos += 1  # skip the stuffed 0x00
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """Decode a baseline JPEG into (width, height, luma bytes
    row-major) — grayscale Y directly; color (4:4:4 / 4:2:2 / 4:2:0)
    through YCbCr→RGB (JFIF, replicated chroma upsampling) then the
    same ITU-R 601-2 integer luma as the BMP/PNG paths.  None for
    anything outside the documented scope or corrupt."""
    b = bytes(b)
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    pos = 2
    try:
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xD8:
                pos += 2
                continue
            if marker == 0xD9:
                return None  # EOI before any scan
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            seg = b[pos + 4 : pos + 2 + seglen]
            if len(seg) != seglen - 2:
                return None
            data_start = pos + 2 + seglen
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    if pq == 0:
                        vals = list(seg[i : i + 64])
                        i += 64
                    elif pq == 1:
                        vals = [
                            struct.unpack_from(">H", seg, i + 2 * j)[0]
                            for j in range(64)
                        ]
                        i += 128
                    else:
                        return None
                    if len(vals) != 64:
                        return None
                    tbl = [0] * 64
                    for j, z in enumerate(ZIGZAG):
                        tbl[z] = vals[j]
                    qt[tq] = tbl
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = [0] + list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17 : i + 17 + n])
                    if len(vals) != n:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                    i += 17 + n
            elif marker == 0xC0:  # SOF0: baseline
                prec, height, width, nc = (
                    seg[0],
                    struct.unpack_from(">H", seg, 1)[0],
                    struct.unpack_from(">H", seg, 3)[0],
                    seg[5],
                )
                if prec != 8 or nc not in (1, 3):
                    return None
                for ci in range(nc):
                    cid, hv, tq = (
                        seg[6 + 3 * ci],
                        seg[7 + 3 * ci],
                        seg[8 + 3 * ci],
                    )
                    h, v = hv >> 4, hv & 0x0F
                    if h not in (1, 2) or v not in (1, 2):
                        return None  # sampling factors out of scope
                    comps.append((cid, h, v, tq))
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline SOF
            elif marker == 0xDD:
                return None  # restart intervals out of scope
            elif marker == 0xDA:  # SOS: entropy-coded data follows
                ns = seg[0]
                if not comps or ns != len(comps):
                    return None
                by_id = {c[0]: i for i, c in enumerate(comps)}
                for si in range(ns):
                    cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                    if cs not in by_id:
                        return None
                    scan.append((by_id[cs], tt >> 4, tt & 0x0F))
                return _decode_scan(
                    b, data_start, width, height, comps, scan,
                    qt, huff_dc, huff_ac,
                )
            # APPn/COM/others: skip
            pos = data_start
        return None
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def _decode_scan(b, pos, width, height, comps, scan, qt, huff_dc, huff_ac):
    """Entropy-coded scan → luma plane.  General sampling-factor MCU
    walk (each factor 1 or 2): an MCU holds h_i×v_i blocks of
    component i in raster order, so 4:4:4 (1x1,1x1,1x1), 4:2:2
    (2x1,1x1,1x1) and 4:2:0 (2x2,1x1,1x1) — the forms real scraped
    JPEGs actually use — all decode from one loop.  Subsampled chroma
    upsamples by sample replication (nearest): cx = x·h_c//h_max —
    the cheap standard reconstruction, pinned in pytest."""
    from .multimodal import _luma_601

    r = _BitReader(b, pos)
    nc = len(comps)
    if nc == 1:
        # T.81 A.2: a single-component scan is NON-INTERLEAVED — one
        # block per MCU, sampling factors ignored (gray JPEGs often
        # declare 2x2 factors that mean nothing)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcux = (width + 8 * max_h - 1) // (8 * max_h)
    mcuy = (height + 8 * max_v - 1) // (8 * max_v)
    strides = [mcux * 8 * c[1] for c in comps]
    planes = [
        bytearray(strides[i] * mcuy * 8 * comps[i][2]) for i in range(nc)
    ]
    pred = [0] * nc
    floor = math.floor
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                _, ch, cv, tq = comps[ci]
                _, dct, act = scan[ci]
                q = qt[tq]
                for byy in range(cv):
                    for bxx in range(ch):
                        coef = [0] * 64
                        t = r.decode(huff_dc[dct])
                        diff = _extend(r.read_bits(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        kk = 1
                        while kk < 64:
                            rs = r.decode(huff_ac[act])
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    kk += 16  # ZRL
                                    continue
                                break  # EOB
                            kk += rr
                            if kk > 63:
                                raise ValueError("AC run past block end")
                            z = ZIGZAG[kk]
                            coef[z] = _extend(r.read_bits(ss), ss) * q[z]
                            kk += 1
                        if kk == 1 and not any(coef[1:]):
                            # DC-only block: the IDCT is a flat fill
                            # at exactly DC/8 — libjpeg's idct_1x1
                            # shortcut.  This is the EXACT mathematical
                            # transform (the full float path carries
                            # ~1e-13 basis error that can flip an
                            # exact .5 rounding boundary); pytest pins
                            # the shortcut to the exact value and to
                            # the full transform away from boundaries.
                            px = [coef[0] / 8.0] * 64
                        else:
                            px = idct_2d(coef)
                        plane = planes[ci]
                        stride = strides[ci]
                        x0 = (mx * ch + bxx) * 8
                        y0 = (my * cv + byy) * 8
                        for yy in range(8):
                            base = (y0 + yy) * stride + x0
                            for xx in range(8):
                                # half-up rounding (libjpeg DESCALE),
                                # NOT Python's banker's round: keeps
                                # the 1x1 shortcut and the full IDCT
                                # identical on exact .5 boundaries
                                v = floor(px[yy * 8 + xx] + 0.5) + 128
                                plane[base + xx] = (
                                    0 if v < 0 else (255 if v > 255 else v)
                                )
    luma = bytearray(width * height)
    if nc == 1:
        p, stride = planes[0], strides[0]
        for y in range(height):
            luma[y * width : (y + 1) * width] = p[
                y * stride : y * stride + width
            ]
    else:
        (_, hy, vy, _), (_, hb, vb, _), (_, hr, vr, _) = comps
        py, pcb, pcr = planes
        sy, sb, sr = strides
        for y in range(height):
            for x in range(width):
                yy = py[(y * vy // max_v) * sy + (x * hy // max_h)]
                cb = pcb[(y * vb // max_v) * sb + (x * hb // max_h)] - 128
                cr = pcr[(y * vr // max_v) * sr + (x * hr // max_h)] - 128
                rr = min(255, max(0, floor(yy + 1.402 * cr + 0.5)))
                gg = min(
                    255,
                    max(
                        0,
                        floor(yy - 0.344136 * cb - 0.714136 * cr + 0.5),
                    ),
                )
                bb = min(255, max(0, floor(yy + 1.772 * cb + 0.5)))
                luma[y * width + x] = _luma_601(rr, gg, bb)
    return width, height, bytes(luma)


# ---------------------------------------------------------------------------
# synthetic encoder (known coefficients -> in-sandbox oracle)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def encode_jpeg_coeffs(
    width: int, height: int, blocks: list[list[int]], qtable: list[int]
) -> bytes:
    """Serialize QUANTIZED coefficient blocks (zigzag order, one list
    of 64 per 8x8 block, row-major block order) as a grayscale
    baseline JPEG with the Annex-K luminance Huffman tables — the
    known-coefficient synthetic encoder that makes lossy JPEG
    oracle-able: the decoder must reproduce exactly
    IDCT(coeff ⊙ qtable) + 128, nothing hidden."""
    bw, bh = (width + 7) // 8, (height + 7) // 8
    if len(blocks) != bw * bh:
        raise ValueError("need one block per 8x8 tile")
    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    w = _BitWriter()
    pred = 0
    for blk in blocks:
        diff = blk[0] - pred
        pred = blk[0]
        t = _category(diff)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_codes[0xF0]
                w.write(zc, zl)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            ec, el = ac_codes[0x00]
            w.write(ec, el)
    entropy = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    zz_q = bytes(qtable[ZIGZAG[j]] for j in range(64))
    dqt = seg(0xDB, bytes([0x00]) + zz_q)
    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([1, 1, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUMA_BITS[1:]) + bytes(DC_LUMA_VALS),
    ) + seg(
        0xC4,
        bytes([0x10]) + bytes(AC_LUMA_BITS[1:]) + bytes(AC_LUMA_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"
    )


def encode_jpeg_gray_flat(
    width: int, height: int, values: bytes
) -> bytes:
    """DC-only grayscale baseline JPEG: each 8x8 block is the FLAT
    sample ``values[i]`` — encoded as DC = 8·(v−128) under an all-ones
    quantization table, whose IDCT is exactly v−128 (no rounding), so
    the decode is LOSSLESS for this constructed class and the decoded
    statistics are closed-form in the inputs.  ``width``/``height``
    must be multiples of 8; ``values`` holds one byte per block,
    row-major."""
    bw, bh = width // 8, height // 8
    if width % 8 or height % 8 or len(values) != bw * bh:
        raise ValueError("need one flat byte per full 8x8 block")
    blocks = []
    for v in values:
        blk = [0] * 64
        blk[0] = 8 * (v - 128)
        blocks.append(blk)
    return encode_jpeg_coeffs(width, height, blocks, [1] * 64)


def jpeg_decoder(b: bytes) -> dict | None:
    """Pure-Python decode of baseline JPEGs → the same grayscale
    feature dict as the BMP/PNG decoders."""
    import hashlib

    parsed = jpeg_pixels(bytes(b))
    if parsed is None:
        return None
    width, height, px = parsed
    n = len(px)
    return {
        "width": width,
        "height": height,
        "mode": "L",
        "n_pixels": n,
        "sum_luma": sum(px),
        "mean_luma": round(sum(px) / n, 6) if n else 0.0,
        "pixel_digest": hashlib.md5(px).hexdigest(),
    }
