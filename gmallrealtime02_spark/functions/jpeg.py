"""Pure-Python BASELINE JPEG codec — the last external-codec
dependency for scraped-corpus media columns, removed (round-10 verdict
item 7: "decide-or-document"; this is the decide branch).

Decoder scope (reject-clean outside it, null rows never task
failures): baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
round 11 — spectral-selection + successive-approximation scan
accumulation per T.81 Annex G over the same marker/Huffman machinery),
8-bit samples, Huffman entropy coding, RESTART INTERVALS (DRI +
RSTn cycle verification, DC-prediction/EOBRUN resets — round 11;
ubiquitous in camera/scraper output for error resilience), grayscale
(1 component, non-interleaved per T.81 A.2) or YCbCr (3 components)
at sampling factors up to 2 — 4:4:4, 4:2:2 and 4:2:0, the forms real
scraped JPEGs use; subsampled chroma upsamples by sample replication.
Arithmetic coding, 12-bit samples, and factors > 2 return None.
Progressive matters at corpus scale: it is a double-digit share of
scraped web JPEGs, and before round 11 every one of them silently
nulled out of a curation run.

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

    def sync_restart(self) -> int:
        """Consume the padding bits + RSTn marker at a restart-interval
        boundary (T.81 F.2.2.5): discard the partial byte (its stuffed
        0x00 too, if the padded byte was 0xFF), then require FF D0-D7;
        returns the marker's modulo-8 index for the cycle check."""
        d = self.data
        if self.bit:
            byte = d[self.pos]
            self.pos += 1
            self.bit = 0
            if byte == 0xFF:
                if self.pos >= len(d) or d[self.pos] != 0x00:
                    raise ValueError("bad padding before restart")
                self.pos += 1
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = d[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError("expected RSTn marker")
        self.pos += 2
        return m - 0xD0


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _render_block(coef: list[int]) -> list[float]:
    """Dequantized natural-order coefficients → 64 pixel floats.
    DC-only blocks take the exact idct_1x1 shortcut (flat fill at
    DC/8) — the EXACT mathematical transform; the full float path
    carries ~1e-13 basis error that can flip an exact .5 rounding
    boundary.  Pytest pins the shortcut to the exact value and to the
    full transform away from boundaries."""
    if not any(coef[1:]):
        return [coef[0] / 8.0] * 64
    return idct_2d(coef)


def _fill_block(plane: bytearray, stride: int, x0: int, y0: int, px) -> None:
    """Half-up rounding (libjpeg DESCALE), NOT Python's banker's
    round: keeps the 1x1 shortcut and the full IDCT identical on
    exact .5 boundaries."""
    floor = math.floor
    for yy in range(8):
        base = (y0 + yy) * stride + x0
        row = px[yy * 8 : yy * 8 + 8]
        for xx in range(8):
            v = floor(row[xx] + 0.5) + 128
            plane[base + xx] = 0 if v < 0 else (255 if v > 255 else v)


def _planes_to_luma(width, height, comps, planes, strides, max_h, max_v):
    """Component planes → the output luma plane: gray copies Y
    directly; color goes YCbCr→RGB (JFIF, replicated chroma
    upsampling) then the same ITU-R 601-2 integer luma as the BMP/PNG
    paths."""
    from .multimodal import _luma_601

    floor = math.floor
    luma = bytearray(width * height)
    if len(comps) == 1:
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


def _parse_dqt(seg: bytes, qt: dict[int, list[int]]) -> None:
    """DQT segment (possibly several tables) → natural-order tables."""
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
            raise ValueError("bad DQT precision")
        if len(vals) != 64:
            raise ValueError("short DQT")
        tbl = [0] * 64
        for j, z in enumerate(ZIGZAG):
            tbl[z] = vals[j]
        qt[tq] = tbl


def _parse_dht(
    seg: bytes, huff_dc: dict[int, _Huff], huff_ac: dict[int, _Huff]
) -> None:
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0x0F
        bits = [0] + list(seg[i + 1 : i + 17])
        n = sum(bits)
        vals = list(seg[i + 17 : i + 17 + n])
        if len(vals) != n:
            raise ValueError("short DHT")
        (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
        i += 17 + n


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
    progressive = False
    restart_interval = 0
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
                _parse_dqt(seg, qt)
            elif marker == 0xC4:  # DHT
                _parse_dht(seg, huff_dc, huff_ac)
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                progressive = marker == 0xC2
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
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # extended/lossless/arithmetic SOF
            elif marker == 0xDD:  # DRI: restart interval (round 11)
                if len(seg) != 2:
                    return None
                restart_interval = struct.unpack(">H", seg)[0]
            elif marker == 0xDA:  # SOS: entropy-coded data follows
                if progressive:
                    # the progressive walk owns everything from this
                    # marker on: scan accumulation across multiple SOS
                    # (with DHT/DQT redefinitions between), render at EOI
                    return _decode_progressive(
                        b, pos, width, height, comps, qt, huff_dc,
                        huff_ac, restart_interval,
                    )
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
                    qt, huff_dc, huff_ac, restart_interval,
                )
            # APPn/COM/others: skip
            pos = data_start
        return None
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def _decode_scan(
    b, pos, width, height, comps, scan, qt, huff_dc, huff_ac,
    restart_interval=0,
):
    """Entropy-coded scan → luma plane.  General sampling-factor MCU
    walk (each factor 1 or 2): an MCU holds h_i×v_i blocks of
    component i in raster order, so 4:4:4 (1x1,1x1,1x1), 4:2:2
    (2x1,1x1,1x1) and 4:2:0 (2x2,1x1,1x1) — the forms real scraped
    JPEGs actually use — all decode from one loop.  Subsampled chroma
    upsamples by sample replication (nearest): cx = x·h_c//h_max —
    the cheap standard reconstruction, pinned in pytest."""
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
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # T.81 F.2.2.5: byte-align, verify the RSTn cycle,
                # reset every component's DC prediction
                n = r.sync_restart()
                if n != (mcu_i // restart_interval - 1) % 8:
                    raise ValueError("restart marker out of sequence")
                pred = [0] * nc
            mcu_i += 1
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
                        px = _render_block(coef)
                        _fill_block(
                            planes[ci],
                            strides[ci],
                            (mx * ch + bxx) * 8,
                            (my * cv + byy) * 8,
                            px,
                        )
    return _planes_to_luma(
        width, height, comps, planes, strides, max_h, max_v
    )


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G)
# ---------------------------------------------------------------------------


def _ac_first(r, tbl, coef, ss, se, al, eobrun):
    """One block of an AC FIRST scan (Ah=0): T.81 G.1.2.2 run/size
    with end-of-band runs — an EOBRUN code (RRRR<<4, SSSS=0, RRRR<15)
    covers 2^RRRR+extra blocks whose band is entirely zero beyond the
    coded coefficients.  Coefficients land shifted left by the scan's
    point transform Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = r.decode(tbl)
        rr, s = rs >> 4, rs & 0x0F
        if s:
            k += rr
            if k > se:
                raise ValueError("AC run past band end")
            coef[ZIGZAG[k]] = _extend(r.read_bits(s), s) << al
            k += 1
        else:
            if rr != 15:
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.read_bits(rr)
                break
            k += 16  # ZRL
    return eobrun


def _ac_refine(r, tbl, coef, ss, se, al, eobrun):
    """One block of an AC REFINEMENT scan (Ah>0): T.81 G.1.2.3 /
    libjpeg decode_mcu_AC_refine.  Newly-significant coefficients
    arrive as ±2^Al; every already-nonzero coefficient visited gets a
    correction bit (add 2^Al toward its sign when set and the bit is
    not already present); zero-run lengths count only zero-HISTORY
    positions; an EOBRUN covers whole blocks whose remaining nonzero
    coefficients still consume correction bits."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = r.decode(tbl)
            rr, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.read_bits(rr)
                    break
                # ZRL: pass over 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                newval = p1 if r.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    if r.read_bit() and (coef[z] & p1) == 0:
                        coef[z] += p1 if coef[z] >= 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("refinement past band end")
                coef[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                if r.read_bit() and (coef[z] & p1) == 0:
                    coef[z] += p1 if coef[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _scan_end(d: bytes, r: _BitReader) -> int:
    """First unconsumed byte position after an entropy-coded scan:
    mid-byte padding bits are discarded, and if the padded byte was a
    stuffed 0xFF its 0x00 goes too."""
    pos = r.pos
    if r.bit:
        byte = d[pos]
        pos += 1
        if byte == 0xFF:
            pos += 1
    return pos


def _next_marker(d: bytes, pos: int) -> int:
    """Position of the next marker (0xFF + non-fill byte) at or after
    ``pos``; tolerates 0xFF fill bytes before the marker."""
    while pos + 1 < len(d):
        if d[pos] == 0xFF:
            if d[pos + 1] == 0xFF:
                pos += 1
                continue
            if d[pos + 1] != 0x00:
                return pos
            pos += 2
            continue
        pos += 1
    raise ValueError("no marker after scan")


def _decode_progressive(
    b, pos, width, height, comps, qt, huff_dc, huff_ac,
    restart_interval=0,
):
    """SOF2 scan accumulation: every SOS deposits bits of the
    quantized coefficients (DC first/refine, AC first/refine per band)
    into per-component block arrays; DHT/DQT may be redefined between
    scans; EOI triggers one dequantize+IDCT render through the same
    block/plane machinery as the baseline path.  ``pos`` points at the
    first SOS marker.

    Geometry per T.81: interleaved scans (DC only — AC progressive
    scans are single-component by B.2.3) walk the MCU-padded grid
    including dummy blocks; non-interleaved scans walk the component's
    REAL block grid ceil(ceil(dim·f/f_max)/8) — dummy blocks are never
    coded there, so storage is a lazy dict over the padded grid with
    absent blocks rendering as zeros."""
    nc = len(comps)
    if nc == 1:
        # T.81 A.2: single-component geometry ignores declared factors
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcux = (width + 8 * max_h - 1) // (8 * max_h)
    mcuy = (height + 8 * max_v - 1) // (8 * max_v)
    padw = [mcux * c[1] for c in comps]
    padh = [mcuy * c[2] for c in comps]
    nbw = [
        ((width * c[1] + max_h - 1) // max_h + 7) // 8 for c in comps
    ]
    nbh = [
        ((height * c[2] + max_v - 1) // max_v + 7) // 8 for c in comps
    ]
    coefs: list[dict[tuple[int, int], list[int]]] = [{} for _ in range(nc)]

    def blk(ci: int, by: int, bx: int) -> list[int]:
        d = coefs[ci]
        t = d.get((by, bx))
        if t is None:
            t = d[(by, bx)] = [0] * 64
        return t

    saw_scan = False
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("lost marker sync")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI: render
            if not saw_scan:
                raise ValueError("EOI before any scan")
            break
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        data_start = pos + 2 + seglen
        if marker == 0xC4:
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xDD:  # DRI may be redefined between scans
            if len(seg) != 2:
                raise ValueError("bad DRI")
            restart_interval = struct.unpack(">H", seg)[0]
        elif marker == 0xDA:
            ns = seg[0]
            by_id = {c[0]: i for i, c in enumerate(comps)}
            scomp = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError("scan names unknown component")
                scomp.append((by_id[cs], tt >> 4, tt & 0x0F))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            r = _BitReader(b, data_start)
            eobrun = 0
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                preds = [0] * nc

                def dc_one(ci: int, dct: int, by: int, bx: int) -> None:
                    c0 = blk(ci, by, bx)
                    if ah == 0:
                        t = r.decode(huff_dc[dct])
                        diff = _extend(r.read_bits(t), t)
                        preds[ci] += diff
                        c0[0] = preds[ci] << al
                    elif r.read_bit():
                        c0[0] |= 1 << al

                ri = restart_interval
                unit = 0
                if ns > 1:
                    if ns != nc:
                        raise ValueError("partial interleaved DC scan")
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if ri and unit and unit % ri == 0:
                                if r.sync_restart() != (
                                    unit // ri - 1
                                ) % 8:
                                    raise ValueError("RSTn out of sequence")
                                preds[:] = [0] * nc
                            unit += 1
                            for ci, dct, _act in scomp:
                                _, ch, cv, _ = comps[ci]
                                for byy in range(cv):
                                    for bxx in range(ch):
                                        dc_one(
                                            ci, dct,
                                            my * cv + byy, mx * ch + bxx,
                                        )
                else:
                    ci, dct, _act = scomp[0]
                    for by in range(nbh[ci]):
                        for bx in range(nbw[ci]):
                            if ri and unit and unit % ri == 0:
                                if r.sync_restart() != (
                                    unit // ri - 1
                                ) % 8:
                                    raise ValueError("RSTn out of sequence")
                                preds[:] = [0] * nc
                            unit += 1
                            dc_one(ci, dct, by, bx)
            else:
                # AC scans: single component, non-interleaved (B.2.3)
                if ns != 1 or se > 63 or ss > se:
                    raise ValueError("bad AC scan header")
                ci, _dct, act = scomp[0]
                tbl = huff_ac[act]
                step = _ac_first if ah == 0 else _ac_refine
                ri = restart_interval
                unit = 0
                for by in range(nbh[ci]):
                    for bx in range(nbw[ci]):
                        if ri and unit and unit % ri == 0:
                            if eobrun:
                                raise ValueError(
                                    "EOB run crosses a restart boundary"
                                )
                            if r.sync_restart() != (unit // ri - 1) % 8:
                                raise ValueError("RSTn out of sequence")
                        unit += 1
                        eobrun = step(
                            r, tbl, blk(ci, by, bx), ss, se, al, eobrun
                        )
            saw_scan = True
            pos = _next_marker(b, _scan_end(b, r))
            continue
        pos = data_start
    else:
        raise ValueError("no EOI")

    strides = [padw[i] * 8 for i in range(nc)]
    planes = [bytearray(strides[i] * padh[i] * 8) for i in range(nc)]
    zeros = [0] * 64
    for ci in range(nc):
        q = qt[comps[ci][3]]
        for by in range(padh[ci]):
            for bx in range(padw[ci]):
                cz = coefs[ci].get((by, bx))
                if cz is None:
                    cz = zeros
                coef = [cz[i] * q[i] for i in range(64)]
                px = _render_block(coef)
                _fill_block(planes[ci], strides[ci], bx * 8, by * 8, px)
    return _planes_to_luma(
        width, height, comps, planes, strides, max_h, max_v
    )


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

    def restart(self, n: int) -> None:
        """Pad to a byte boundary (1-bits, stuffed if 0xFF) and emit
        the RSTn marker for interval index ``n`` (cycles mod 8)."""
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        self.out += bytes([0xFF, 0xD0 + (n % 8)])

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
    width: int,
    height: int,
    blocks: list[list[int]],
    qtable: list[int],
    restart_interval: int = 0,
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
    for bi, blk in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            w.restart(bi // restart_interval - 1)
            pred = 0
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
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
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
        b"\xff\xd8" + dqt + dri + sof + dht + sos + entropy
        + b"\xff\xd9"
    )


# Progressive AC scans emit EOBRUN symbols (RRRR<<4, SSSS=0, RRRR<15)
# that the Annex-K sequential tables simply do not contain, so the
# synthetic progressive encoder ships its own flat canonical table:
# every (run,size) symbol with size<=10 at code length 8 (176 symbols
# < 256, all-ones 8-bit code left unassigned per C.2).
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = [(r << 4) | s for r in range(16) for s in range(11)]

#: the default successive-approximation scan script: DC at Al=3 then
#: three one-bit DC refinements, AC band 1-63 at Al=1 then its
#: refinement — the shape libjpeg's default progressive script uses,
#: compressed to one AC band
PROG_SCANS = [
    (0, 0, 0, 3),
    (0, 0, 3, 2),
    (0, 0, 2, 1),
    (0, 0, 1, 0),
    (1, 63, 0, 1),
    (1, 63, 1, 0),
]


def _encode_ac_first_scan(w, blocks, ss, se, al, ac_codes, ri=0):
    """AC first scan (G.1.2.2 / libjpeg encode_mcu_AC_first): the
    point transform is a SIGN-MAGNITUDE shift (truncate toward zero),
    zero-history runs >15 emit ZRL, and blocks whose band ends in
    zeros join an EOBRUN batch flushed at the next significant
    coefficient or scan end."""
    eobrun = 0

    def emit(sym):
        code, ln = ac_codes[sym]
        w.write(code, ln)

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            emit(nbits << 4)
            if nbits:
                w.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for bi, blk in enumerate(blocks):
        if ri and bi and bi % ri == 0:
            flush_eob()  # an EOB run may not cross a restart boundary
            w.restart(bi // ri - 1)
        r = 0
        for k in range(ss, se + 1):
            t = blk[k]
            neg = t < 0
            t = (-t if neg else t) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                emit(0xF0)
                r -= 16
            s = t.bit_length()
            emit((r << 4) | s)
            v = -t if neg else t
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_ac_refine_scan(w, blocks, ss, se, al, ac_codes, ri=0):
    """AC refinement scan (G.1.2.3 / libjpeg encode_mcu_AC_refine):
    correction bits for already-significant coefficients buffer until
    the next emitted symbol; EOB-run blocks park their whole band's
    correction bits until the run flushes."""
    eobrun = 0
    pend: list[int] = []  # correction bits owed from EOB-run blocks

    def emit(sym):
        code, ln = ac_codes[sym]
        w.write(code, ln)

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            emit(nbits << 4)
            if nbits:
                w.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
        for bit in pend:
            w.write(bit, 1)
        pend = []

    for bi, blk in enumerate(blocks):
        if ri and bi and bi % ri == 0:
            flush_eob()  # run + buffered correction bits flush first
            w.restart(bi // ri - 1)
        absv = {}
        eob = ss - 1  # index of the LAST newly-significant coefficient
        for k in range(ss, se + 1):
            t = abs(blk[k]) >> al
            absv[k] = t
            if t == 1:
                eob = k
        r = 0
        br: list[int] = []  # this block's buffered correction bits
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                emit(0xF0)
                r -= 16
                for bit in br:
                    w.write(bit, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            emit((r << 4) | 1)
            w.write(0 if blk[k] < 0 else 1, 1)
            for bit in br:
                w.write(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_coeffs_progressive(
    width: int,
    height: int,
    blocks: list[list[int]],
    qtable: list[int],
    scans: list[tuple[int, int, int, int]] = PROG_SCANS,
    restart_interval: int = 0,
) -> bytes:
    """Serialize QUANTIZED coefficient blocks (zigzag order, one list
    of 64 per 8x8 block, row-major block order) as a grayscale
    PROGRESSIVE JPEG (SOF2) following the scan script
    ``[(Ss, Se, Ah, Al), ...]`` — the known-coefficient synthetic
    encoder extended to spectral selection + successive approximation,
    so progressive decoding is oracle-able exactly like baseline: the
    decoder must reproduce IDCT(coeff ⊙ qtable) + 128 after
    accumulating every scan."""
    bw, bh = (width + 7) // 8, (height + 7) // 8
    if len(blocks) != bw * bh:
        raise ValueError("need one block per 8x8 tile")
    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_PROG_BITS, AC_PROG_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    zz_q = bytes(qtable[ZIGZAG[j]] for j in range(64))
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([1, 1, 0x11, 0]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUMA_BITS[1:]) + bytes(DC_LUMA_VALS),
    )
    out += seg(
        0xC4,
        bytes([0x10]) + bytes(AC_PROG_BITS[1:]) + bytes(AC_PROG_VALS),
    )
    for ss, se, ah, al in scans:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        w = _BitWriter()
        ri = restart_interval
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan with Se != 0")
            if ah == 0:
                pred = 0
                for bi, blk in enumerate(blocks):
                    if ri and bi and bi % ri == 0:
                        w.restart(bi // ri - 1)
                        pred = 0
                    t = blk[0] >> al  # DC point transform: floor shift
                    diff = t - pred
                    pred = t
                    s = _category(diff)
                    code, ln = dc_codes[s]
                    w.write(code, ln)
                    if s:
                        w.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
            else:
                for bi, blk in enumerate(blocks):
                    if ri and bi and bi % ri == 0:
                        w.restart(bi // ri - 1)
                    w.write((blk[0] >> al) & 1, 1)
        elif ah == 0:
            _encode_ac_first_scan(w, blocks, ss, se, al, ac_codes, ri)
        else:
            _encode_ac_refine_scan(w, blocks, ss, se, al, ac_codes, ri)
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray_flat_progressive(
    width: int,
    height: int,
    values: bytes,
    scans: list[tuple[int, int, int, int]] = PROG_SCANS,
) -> bytes:
    """Progressive twin of :func:`encode_jpeg_gray_flat`: the same
    DC-only flat blocks (DC = 8·(v−128), all-ones quantization, exact
    IDCT ⇒ lossless), emitted through the successive-approximation
    scan script — DC = 8·(v−128) is a multiple of 8, so every
    point-transformed DC scan is exact and the closed-form codepoint
    oracle transfers unchanged to the progressive decode path."""
    bw, bh = width // 8, height // 8
    if width % 8 or height % 8 or len(values) != bw * bh:
        raise ValueError("need one flat byte per full 8x8 block")
    blocks = []
    for v in values:
        blk = [0] * 64
        blk[0] = 8 * (v - 128)
        blocks.append(blk)
    return encode_jpeg_coeffs_progressive(
        width, height, blocks, [1] * 64, scans
    )


def encode_jpeg_gray_flat(
    width: int, height: int, values: bytes, restart_interval: int = 0
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
    return encode_jpeg_coeffs(
        width, height, blocks, [1] * 64, restart_interval
    )


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
