"""Baseline JPEG codec (functions/jpeg.py): marker walk, Huffman
stream, DC prediction, run-length AC, zigzag, dequantization, IDCT —
pinned against an in-test reference transform, the DC-only lossless
class, and reject paths.  Pillow parity where Pillow ships."""

from __future__ import annotations

import math
import random
import struct

import pytest

from gmallrealtime02_spark.functions.jpeg import (
    ZIGZAG,
    encode_jpeg_coeffs,
    encode_jpeg_gray_flat,
    idct_2d,
    jpeg_decoder,
    jpeg_pixels,
)
from gmallrealtime02_spark.sources import load_table


def _reference_pixels(blocks, qt, bw):
    """Reference decode of quantized blocks: dezigzag, dequant, full
    IDCT, half-up round, shift, clamp — the executable spec."""
    out = {}
    for bi, blk in enumerate(blocks):
        coef = [0] * 64
        for k in range(64):
            coef[ZIGZAG[k]] = blk[k] * qt[ZIGZAG[k]]
        px = idct_2d(coef)
        for y in range(8):
            for x in range(8):
                v = math.floor(px[y * 8 + x] + 0.5) + 128
                out[(bi % bw) * 8 + x, (bi // bw) * 8 + y] = min(
                    255, max(0, v)
                )
    return out


def test_dc_only_blocks_decode_losslessly():
    """The oracle-able class: flat 8x8 blocks under an all-ones
    quantization table roundtrip EXACTLY (DC = 8·(v−128) ⇒ IDCT v−128,
    no quantization error by construction)."""
    vals = bytes(range(64))
    w, h, px = jpeg_pixels(encode_jpeg_gray_flat(64, 64, vals))
    assert (w, h) == (64, 64)
    for bi, v in enumerate(vals):
        x0, y0 = (bi % 8) * 8, (bi // 8) * 8
        got = {px[(y0 + y) * 64 + x0 + x] for y in range(8) for x in range(8)}
        assert got == {v}, (bi, v, got)


def test_random_coefficient_blocks_match_reference_idct():
    """Full AC path: random quantized coefficients through the real
    entropy coding (categories, run lengths, ZRL, EOB, byte stuffing)
    must reproduce dezigzag+dequant+IDCT exactly."""
    random.seed(11)
    qt = [1 + (i % 7) for i in range(64)]  # non-uniform table
    blocks = [
        [random.randint(-40, 40) for _ in range(64)] for _ in range(6)
    ]
    jp = encode_jpeg_coeffs(24, 16, blocks, qt)
    w, h, px = jpeg_pixels(jp)
    assert (w, h) == (24, 16)
    want = _reference_pixels(blocks, qt, bw=3)
    for (x, y), v in want.items():
        assert px[y * 24 + x] == v, (x, y)


def test_zrl_long_runs_and_large_dc_swings():
    """16+ zero runs force ZRL symbols; alternating extreme DCs force
    the widest diff categories (±2040 -> category 11)."""
    qt = [1] * 64
    b1 = [0] * 64
    b1[0] = 8 * (255 - 128)  # +1016
    b1[40] = 7  # 39 zeros before it: two ZRLs + run
    b2 = [0] * 64
    b2[0] = 8 * (0 - 128)  # -1024: diff -2040
    b3 = [0] * 64
    b3[0] = 8 * (255 - 128)  # diff +2040
    jp = encode_jpeg_coeffs(24, 8, [b1, b2, b3], qt)
    got = jpeg_pixels(jp)
    assert got is not None
    want = _reference_pixels([b1, b2, b3], qt, bw=3)
    px = got[2]
    for (x, y), v in want.items():
        assert px[y * 24 + x] == v, (x, y)


def test_dc_shortcut_is_exact_and_agrees_off_boundary():
    """The idct_1x1 shortcut IS the exact mathematical transform for a
    DC-only block (flat DC/8); the full float path carries ~1e-13
    basis error.  Pin: (a) the decoder's output equals the exact
    value for EVERY representable DC, including the .5 rounding
    boundaries where the float path would flip; (b) shortcut and full
    transform agree everywhere off those boundaries."""
    for dc in range(-1024, 1017):
        blk = [0] * 64
        blk[0] = dc
        jp = encode_jpeg_coeffs(8, 8, [blk], [1] * 64)
        got = jpeg_pixels(jp)
        assert got is not None, dc
        exact = min(255, max(0, math.floor(dc / 8.0 + 0.5) + 128))
        assert set(got[2]) == {exact}, dc
        if dc % 8 != 4 and dc % 8 != -4:  # off the .5 boundary
            coef = [0] * 64
            coef[0] = dc
            for s in set(idct_2d(coef)):
                assert math.floor(s + 0.5) == math.floor(dc / 8.0 + 0.5), dc


def test_rejects_out_of_scope_and_corrupt():
    vals = bytes(range(16))
    good = encode_jpeg_gray_flat(32, 32, vals)
    assert jpeg_pixels(b"nonsense") is None
    assert jpeg_pixels(good[:50]) is None  # truncated mid-tables
    assert jpeg_pixels(b"\xff\xd8\xff\xd9") is None  # no scan
    # an SOF2 CLAIM over baseline-coded scan data is corrupt (the
    # progressive walk rejects a DC scan with Se=63), never a crash
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    assert jpeg_pixels(bytes(prog)) is None
    # a DRI whose promised restart markers never appear is corrupt
    dri = good[:2] + b"\xff\xdd\x00\x04\x00\x08" + good[2:]
    assert jpeg_pixels(dri) is None
    # single-component scans are NON-INTERLEAVED (T.81 A.2): declared
    # 2x2 factors on a gray JPEG mean nothing and must decode the same
    sub = bytearray(good)
    j = sub.find(b"\xff\xc0")
    sub[j + 2 + 2 + 5 + 2] = 0x22  # component 0 h/v factors
    assert jpeg_pixels(bytes(sub)) == jpeg_pixels(good)
    # factors > 2 rejected
    big = bytearray(good)
    big[j + 2 + 2 + 5 + 2] = 0x33
    assert jpeg_pixels(bytes(big)) is None


def test_color_444_ycbcr_to_luma():
    """3-component 4:4:4: encode per-component DC-only blocks by hand
    (one DQT/DHT set shared), decode through YCbCr->RGB->ITU luma."""
    from gmallrealtime02_spark.functions.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _category,
        _huff_codes,
    )
    from gmallrealtime02_spark.functions.multimodal import _luma_601

    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    # one MCU (8x8, three components), flat Y/Cb/Cr
    Y, Cb, Cr = 140, 90, 200
    w = _BitWriter()
    for flat in (Y, Cb, Cr):
        dc = 8 * (flat - 128)
        t = _category(dc)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(dc if dc >= 0 else dc + (1 << t) - 1, t)
        ec, el = ac_codes[0x00]
        w.write(ec, el)
    entropy = w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(
        0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS[1:]) + bytes(DC_LUMA_VALS)
    ) + seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS[1:]) + bytes(AC_LUMA_VALS)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    jp = b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"
    got = jpeg_pixels(jp)
    assert got is not None
    width, height, px = got
    assert (width, height) == (8, 8)
    cb, cr = Cb - 128, Cr - 128
    rr = min(255, max(0, math.floor(Y + 1.402 * cr + 0.5)))
    gg = min(
        255, max(0, math.floor(Y - 0.344136 * cb - 0.714136 * cr + 0.5))
    )
    bb = min(255, max(0, math.floor(Y + 1.772 * cb + 0.5)))
    assert set(px) == {_luma_601(rr, gg, bb)}


def test_pillow_parity_bit_exact():
    PIL = pytest.importorskip("PIL.Image")
    import io

    vals = bytes((173 * v + 37) % 256 for v in range(64))
    jp = encode_jpeg_gray_flat(64, 64, vals)
    im = PIL.open(io.BytesIO(jp)).convert("L")
    assert im.size == (64, 64)
    assert bytes(im.tobytes()) == jpeg_pixels(jp)[2]


def test_decoder_dict_and_dispatch():
    from gmallrealtime02_spark.functions.multimodal import (
        media_pixels,
        pure_decoder,
    )

    vals = bytes(range(32))
    jp = encode_jpeg_gray_flat(64, 32, vals)
    d = jpeg_decoder(jp)
    assert d["mode"] == "L" and d["n_pixels"] == 64 * 32
    assert d["sum_luma"] == 64 * sum(vals)
    assert pure_decoder(jp) == d  # magic-byte dispatch
    assert media_pixels(jp) == jpeg_pixels(jp)


def test_decode_media_over_jpeg_table(spark, sf_dir):
    from gmallrealtime02_spark.functions.multimodal import (
        as_jpeg_media_table,
        decode_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = as_jpeg_media_table(docs)
    out = decode_media(media, decoder=jpeg_decoder).select(
        "doc_id", "width", "height", "sum_luma"
    )
    rows = {r.doc_id: r for r in out.collect()}
    for d in docs.collect():
        cps = [min(ord(c), 255) for c in d.text[:64]]
        cps += [0] * (64 - len(cps))
        want = 64 * sum((173 * v + 37) % 256 for v in cps)
        assert rows[d.doc_id].sum_luma == want
        assert (rows[d.doc_id].width, rows[d.doc_id].height) == (64, 64)


def _dc_block_bits(w, flat, pred, dc_codes, ac_codes, _category):
    dc = 8 * (flat - 128)
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    ec, el = ac_codes[0x00]
    w.write(ec, el)
    return dc


def test_color_420_subsampled_decodes():
    """4:2:0 — the dominant real-corpus layout: one MCU = four Y
    blocks (2x2) + one Cb + one Cr at quarter resolution.  DC-only
    flat blocks keep the decode exact; each 8x8 luma quadrant carries
    its own Y while the chroma pair replicates across the whole 16x16
    MCU, so the expected luma per quadrant is closed-form."""
    from gmallrealtime02_spark.functions.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _category,
        _huff_codes,
    )
    from gmallrealtime02_spark.functions.multimodal import _luma_601

    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    Ys = (100, 140, 180, 220)  # the four quadrants, raster order
    Cb, Cr = 90, 200
    w = _BitWriter()
    pred_y = pred_b = pred_r = 0
    for yv in Ys:  # Y blocks first (2x2 raster), then Cb, then Cr
        pred_y = _dc_block_bits(w, yv, pred_y, dc_codes, ac_codes, _category)
    pred_b = _dc_block_bits(w, Cb, pred_b, dc_codes, ac_codes, _category)
    pred_r = _dc_block_bits(w, Cr, pred_r, dc_codes, ac_codes, _category)
    entropy = w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", 16, 16)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(
        0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS[1:]) + bytes(DC_LUMA_VALS)
    ) + seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS[1:]) + bytes(AC_LUMA_VALS)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    jp = b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"
    got = jpeg_pixels(jp)
    assert got is not None
    width, height, px = got
    assert (width, height) == (16, 16)
    cb, cr = Cb - 128, Cr - 128

    def expect(yv):
        rr = min(255, max(0, math.floor(yv + 1.402 * cr + 0.5)))
        gg = min(
            255,
            max(0, math.floor(yv - 0.344136 * cb - 0.714136 * cr + 0.5)),
        )
        bb = min(255, max(0, math.floor(yv + 1.772 * cb + 0.5)))
        return _luma_601(rr, gg, bb)

    for y in range(16):
        for x in range(16):
            q = (y // 8) * 2 + (x // 8)
            assert px[y * 16 + x] == expect(Ys[q]), (x, y, q)


# -- progressive (SOF2) -----------------------------------------------------

from gmallrealtime02_spark.functions.jpeg import (  # noqa: E402
    PROG_SCANS,
    encode_jpeg_coeffs_progressive,
    encode_jpeg_gray_flat_progressive,
)


def test_progressive_dc_only_lossless():
    """The DC-only lossless class extends to progressive unchanged:
    DC = 8·(v−128) is a multiple of 8, so the successive-approximation
    point transforms (Al up to 3) are exact and the decode equals the
    baseline decode byte-for-byte."""
    vals = bytes((173 * v + 37) % 256 for v in range(64))
    got = jpeg_pixels(encode_jpeg_gray_flat_progressive(64, 64, vals))
    assert got is not None
    w, h, px = got
    assert (w, h) == (64, 64)
    assert px == jpeg_pixels(encode_jpeg_gray_flat(64, 64, vals))[2]
    # and the closed form directly
    expect = bytearray(64 * 64)
    for bi, v in enumerate(vals):
        for yy in range(8):
            for xx in range(8):
                expect[((bi // 8) * 8 + yy) * 64 + (bi % 8) * 8 + xx] = v
    assert px == bytes(expect)


def test_progressive_matches_baseline_across_scan_scripts():
    """Spectral selection AND successive approximation, gray, random
    coefficients: whatever legal scan script carries the bits, the
    accumulated coefficients must equal the sequential encoding's —
    progressive(blocks) == baseline(blocks) pixel-for-pixel.  Scripts
    cover: single full band, band splits, DC+AC successive
    approximation with interleaved refinement order, and the libjpeg-
    shaped default."""
    rng = random.Random(1117)
    q = [1 if i == 0 else rng.choice([1, 2, 3, 5, 8]) for i in range(64)]
    scripts = [
        [(0, 0, 0, 0), (1, 63, 0, 0)],
        [(0, 0, 0, 0), (1, 5, 0, 0), (6, 63, 0, 0)],
        [(0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 2), (1, 63, 2, 1),
         (1, 63, 1, 0)],
        PROG_SCANS,
        [(0, 0, 0, 2), (1, 10, 0, 1), (11, 63, 0, 3), (0, 0, 2, 1),
         (1, 10, 1, 0), (11, 63, 3, 2), (0, 0, 1, 0), (11, 63, 2, 1),
         (11, 63, 1, 0)],
    ]
    for trial in range(12):
        bw, bh = rng.choice([(2, 2), (3, 1), (1, 3), (4, 2)])
        blocks = []
        for _ in range(bw * bh):
            blk = [0] * 64
            blk[0] = rng.randint(-1024, 1016)
            for _ in range(rng.randint(0, 20)):
                blk[rng.randint(1, 63)] = rng.randint(-255, 255)
            blocks.append(blk)
        want = jpeg_pixels(encode_jpeg_coeffs(bw * 8, bh * 8, blocks, q))
        for sc in scripts:
            got = jpeg_pixels(
                encode_jpeg_coeffs_progressive(bw * 8, bh * 8, blocks, q, sc)
            )
            assert got == want, (trial, sc)


def test_progressive_eobrun_spans_blocks():
    """A sparse image whose AC band is zero almost everywhere forces
    the encoder's EOBRUN batching (one code covering dozens of blocks)
    and the decoder's run-skip/refinement-tail paths — including a
    late significant coefficient that terminates the run mid-scan."""
    blocks = []
    for i in range(32):
        blk = [0] * 64
        blk[0] = 16 * (i - 16)
        blocks.append(blk)
    blocks[30][17] = -6  # terminates a 30-block EOB run
    q = [1] * 64
    want = jpeg_pixels(encode_jpeg_coeffs(64, 32, blocks, q))
    for sc in (
        [(0, 0, 0, 0), (1, 63, 0, 0)],
        [(0, 0, 0, 0), (1, 63, 0, 1), (1, 63, 1, 0)],
    ):
        got = jpeg_pixels(
            encode_jpeg_coeffs_progressive(64, 32, blocks, q, sc)
        )
        assert got == want, sc


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(
        ">H", len(payload) + 2
    ) + payload


def test_progressive_color_420_dc_interleaved():
    """Color progressive: the DC scan is MCU-INTERLEAVED (all three
    components, 2x2 luma factors) while each AC scan is single-
    component per T.81 B.2.3.  DC-only flat blocks keep the decode
    exact, so the result must equal the baseline 4:2:0 decode of the
    same values."""
    from gmallrealtime02_spark.functions.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _category,
        _huff_codes,
    )

    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    Ys = (100, 140, 180, 220)
    Cb, Cr = 90, 200

    def dc_bits(w, flat, pred):
        dc = 8 * (flat - 128)
        diff = dc - pred
        t = _category(diff)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return dc

    # scan 1: interleaved DC first (Ss=Se=0, Ah=0, Al=0)
    w = _BitWriter()
    pred_y = pred_b = pred_r = 0
    for yv in Ys:
        pred_y = dc_bits(w, yv, pred_y)
    pred_b = dc_bits(w, Cb, pred_b)
    pred_r = dc_bits(w, Cr, pred_r)
    dc_scan = _seg(
        0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0])
    ) + w.flush()
    # scans 2-4: per-component AC first, all-zero band -> one EOB each
    ac_scans = b""
    eb_code, eb_len = ac_codes[0x00]
    for cid, nblocks in ((1, 4), (2, 1), (3, 1)):
        w = _BitWriter()
        for _ in range(nblocks):
            w.write(eb_code, eb_len)
        ac_scans += _seg(
            0xDA, bytes([1, cid, 0x00, 1, 63, 0])
        ) + w.flush()

    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", 16, 16)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = _seg(
        0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS[1:]) + bytes(DC_LUMA_VALS)
    ) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS[1:]) + bytes(AC_LUMA_VALS)
    )
    jp = (
        b"\xff\xd8" + dqt + sof + dht + dc_scan + ac_scans + b"\xff\xd9"
    )
    got = jpeg_pixels(jp)
    assert got is not None
    # the baseline 4:2:0 twin (test_color_420_subsampled_decodes's file)
    w = _BitWriter()
    pred_y = pred_b = pred_r = 0
    for yv in Ys:
        pred_y = _dc_block_bits(w, yv, pred_y, dc_codes, ac_codes, _category)
    pred_b = _dc_block_bits(w, Cb, pred_b, dc_codes, ac_codes, _category)
    pred_r = _dc_block_bits(w, Cr, pred_r, dc_codes, ac_codes, _category)
    base = (
        b"\xff\xd8"
        + dqt
        + _seg(
            0xC0,
            bytes([8])
            + struct.pack(">HH", 16, 16)
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + dht
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"
    )
    assert got == jpeg_pixels(base)


def test_progressive_noninterleaved_grid_is_real_not_padded():
    """4:2:2 at width 24: the MCU-padded luma grid is 4 blocks wide
    (mcux=2 × h=2) but the REAL component grid is ceil(24/8)=3 — the
    interleaved DC scan codes the dummy 4th block, the non-interleaved
    luma AC scan must NOT.  A nonzero AC coefficient in each real
    block makes a grid mistake decode garbage or raise; the expected
    pixels come from the hand-built baseline twin."""
    from gmallrealtime02_spark.functions.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _category,
        _huff_codes,
    )

    dc_codes = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    W, H = 24, 8
    y_dcs = (-120, 40, 200, 0)  # 4 luma blocks per MCU row incl. dummy
    y_ac = (9, -5, 13)  # zigzag index 1 of the three REAL blocks
    cb_dcs = (16, -56)
    cr_dcs = (80, 120)

    def dc_bits(w, dc, pred):
        diff = dc - pred
        t = _category(diff)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return dc

    def ac_one(w, v):
        s = abs(v).bit_length()
        code, ln = ac_codes[(0 << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        eb, el = ac_codes[0x00]
        w.write(eb, el)

    # progressive: interleaved DC scan walks MCUs (Y Y Cb Cr per MCU)
    w = _BitWriter()
    py = pb = pr = 0
    for mx in range(2):
        py = dc_bits(w, y_dcs[2 * mx], py)
        py = dc_bits(w, y_dcs[2 * mx + 1], py)
        pb = dc_bits(w, cb_dcs[mx], pb)
        pr = dc_bits(w, cr_dcs[mx], pr)
    dc_scan = _seg(
        0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0])
    ) + w.flush()
    # luma AC scan: exactly the 3 REAL blocks
    w = _BitWriter()
    for v in y_ac:
        ac_one(w, v)
    y_scan = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0])) + w.flush()
    # chroma AC scans: 2 real blocks each, all-zero band
    ch_scans = b""
    eb, el = ac_codes[0x00]
    for cid in (2, 3):
        w = _BitWriter()
        w.write(eb, el)
        w.write(eb, el)
        ch_scans += _seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0])) + w.flush()

    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    dht = _seg(
        0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS[1:]) + bytes(DC_LUMA_VALS)
    ) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS[1:]) + bytes(AC_LUMA_VALS)
    )
    prog = (
        b"\xff\xd8"
        + dqt
        + _seg(
            0xC2,
            bytes([8])
            + struct.pack(">HH", H, W)
            + bytes([3, 1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + dht
        + dc_scan
        + y_scan
        + ch_scans
        + b"\xff\xd9"
    )
    got = jpeg_pixels(prog)
    assert got is not None

    # baseline twin: interleaved scan codes ALL 4 luma blocks (dummy
    # 4th gets EOB after its DC) with the same real AC coefficients
    w = _BitWriter()
    py = pb = pr = 0
    bi = 0
    for mx in range(2):
        for _ in range(2):
            py = dc_bits(w, y_dcs[bi], py)
            if bi < 3:
                ac_one(w, y_ac[bi])
            else:
                w.write(eb, el)
            bi += 1
        pb = dc_bits(w, cb_dcs[mx], pb)
        w.write(eb, el)
        pr = dc_bits(w, cr_dcs[mx], pr)
        w.write(eb, el)
    base = (
        b"\xff\xd8"
        + dqt
        + _seg(
            0xC0,
            bytes([8])
            + struct.pack(">HH", H, W)
            + bytes([3, 1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + dht
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"
    )
    want = jpeg_pixels(base)
    assert want is not None
    assert got == want


def test_progressive_rejects_stay_clean():
    """Out-of-scope progressive forms return None, never raise:
    restart intervals, arithmetic coding (SOF10), 12-bit samples,
    multi-component AC scans, truncated scan data."""
    vals = bytes(range(64))
    good = encode_jpeg_gray_flat_progressive(64, 64, vals)
    assert jpeg_pixels(good) is not None
    # a DRI injected without its restart markers is corrupt
    sos_at = good.find(b"\xff\xda")
    dri = _seg(0xDD, struct.pack(">H", 4))
    assert jpeg_pixels(good[:sos_at] + dri + good[sos_at:]) is None
    # arithmetic progressive: SOF10 (0xCA) instead of SOF2
    assert jpeg_pixels(good.replace(b"\xff\xc2", b"\xff\xca", 1)) is None
    # 12-bit precision in the SOF2 header
    sof_at = good.find(b"\xff\xc2")
    bad = bytearray(good)
    bad[sof_at + 4] = 12
    assert jpeg_pixels(bytes(bad)) is None
    # AC scan that names two components
    from gmallrealtime02_spark.functions.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
    )

    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = _seg(
        0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS[1:]) + bytes(DC_LUMA_VALS)
    ) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS[1:]) + bytes(AC_LUMA_VALS)
    )
    bad_ac = _seg(0xDA, bytes([2, 1, 0x00, 2, 0x00, 1, 63, 0]))
    assert (
        jpeg_pixels(b"\xff\xd8" + dqt + sof + dht + bad_ac + b"\xff\xd9")
        is None
    )
    # truncated mid-scan
    assert jpeg_pixels(good[: sos_at + 20]) is None


def test_progressive_decoder_dict_and_media_dispatch():
    """jpeg_decoder and the pure_decoder magic dispatch handle
    progressive payloads identically to baseline ones."""
    from gmallrealtime02_spark.functions.multimodal import pure_decoder

    vals = bytes((251 * v + 3) % 256 for v in range(64))
    prog = encode_jpeg_gray_flat_progressive(64, 64, vals)
    base = encode_jpeg_gray_flat(64, 64, vals)
    dp, db = jpeg_decoder(prog), jpeg_decoder(base)
    assert dp == db
    assert dp["width"] == 64 and dp["sum_luma"] == 64 * sum(vals)
    assert pure_decoder(prog) == pure_decoder(base)


# -- restart intervals (DRI, round 11) --------------------------------------

from gmallrealtime02_spark.functions.jpeg import (  # noqa: E402
    encode_jpeg_coeffs,
)


def test_restart_intervals_roundtrip_baseline_and_progressive():
    """DRI + RSTn streams decode identically to their unrestarted
    twins — including interval counts past 8 (the marker index cycles
    mod 8) and intervals not dividing the block count — for baseline
    AND progressive scan scripts (DC-prediction resets, EOBRUN flushed
    at every boundary)."""
    rng = random.Random(23)
    q = [1 if i == 0 else rng.choice([1, 2, 3, 5]) for i in range(64)]
    blocks = []
    for _ in range(24):
        blk = [0] * 64
        blk[0] = rng.randint(-1024, 1016)
        for _ in range(rng.randint(0, 15)):
            blk[rng.randint(1, 63)] = rng.randint(-200, 200)
        blocks.append(blk)
    want = jpeg_pixels(encode_jpeg_coeffs(48, 32, blocks, q))
    scripts = (
        [(0, 0, 0, 0), (1, 63, 0, 0)],
        PROG_SCANS,
        [(0, 0, 0, 1), (0, 0, 1, 0), (1, 20, 0, 1), (21, 63, 0, 0),
         (1, 20, 1, 0)],
    )
    for ri in (1, 3, 5, 7, 9):
        got = jpeg_pixels(
            encode_jpeg_coeffs(48, 32, blocks, q, restart_interval=ri)
        )
        assert got == want, ("baseline", ri)
        for sc in scripts:
            got = jpeg_pixels(
                encode_jpeg_coeffs_progressive(
                    48, 32, blocks, q, sc, restart_interval=ri
                )
            )
            assert got == want, ("progressive", ri, sc)


def test_restart_marker_sequence_is_verified():
    """A stream whose RSTn indices break the modulo-8 cycle (a sign of
    dropped segments) is corrupt — None, not garbage pixels."""
    vals = bytes((149 * v + 53) % 256 for v in range(64))
    good = encode_jpeg_gray_flat(64, 64, vals, restart_interval=5)
    assert jpeg_pixels(good) is not None
    # corrupt the SECOND restart marker's index (D1 -> D5)
    first = good.find(b"\xff\xd0")
    second = good.find(b"\xff\xd1", first)
    assert second > 0
    bad = bytearray(good)
    bad[second + 1] = 0xD5
    assert jpeg_pixels(bytes(bad)) is None
    # dropping a marker entirely desynchronizes the stream: reject
    dropped = good[:second] + good[second + 2 :]
    assert jpeg_pixels(dropped) is None


def test_restart_decoder_dict_matches_plain():
    vals = bytes((149 * v + 53) % 256 for v in range(64))
    plain = jpeg_decoder(encode_jpeg_gray_flat(64, 64, vals))
    rst = jpeg_decoder(
        encode_jpeg_gray_flat(64, 64, vals, restart_interval=5)
    )
    assert rst == plain
    prog_rst = jpeg_decoder(
        encode_jpeg_gray_flat_progressive(64, 64, vals)
    )
    assert prog_rst["pixel_digest"] == plain["pixel_digest"]
