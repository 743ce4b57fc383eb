"""Pure-Python PNG codec: chunk walk, zlib inflate, all five scanline
filters, grayscale + truecolor luma, corruption edges, Pillow bit-parity
where Pillow ships, and the magic-byte dispatch decode_media defaults to
without Pillow."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from gmallrealtime02_spark.functions.multimodal import (
    as_png_media_table,
    decode_media,
    encode_png,
    media_pixels,
    png_decoder,
    png_pixels,
    pure_decoder,
    resize_pixels,
)
from gmallrealtime02_spark.sources import load_table


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png(width, height, ctype, rows) -> bytes:
    """Hand-build a PNG from pre-FILTERED scanlines (each: filter byte +
    filtered data) — lets the tests exercise every filter type the
    in-repo encoder (always filter 0) does not emit."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = b"".join(rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_encode_decode_roundtrip_exact():
    for w, h in [(8, 8), (5, 3), (1, 1), (7, 2)]:
        luma = bytes((i * 37 + 11) % 256 for i in range(w * h))
        assert png_pixels(encode_png(w, h, luma)) == (w, h, luma), (w, h)


def test_all_five_filters_decode():
    """One image per filter type, same target pixels: a 3x3 gradient.
    Expected filtered bytes derived by applying the spec forward."""
    w = h = 3
    luma = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])

    def rows_with(ftype):
        out = []
        prev = bytes(w)
        for y in range(h):
            row = luma[y * w : (y + 1) * w]
            if ftype == 0:
                filt = row
            elif ftype == 1:  # Sub
                filt = bytes(
                    (row[i] - (row[i - 1] if i else 0)) & 0xFF
                    for i in range(w)
                )
            elif ftype == 2:  # Up
                filt = bytes((row[i] - prev[i]) & 0xFF for i in range(w))
            elif ftype == 3:  # Average
                filt = bytes(
                    (row[i] - (((row[i - 1] if i else 0) + prev[i]) >> 1))
                    & 0xFF
                    for i in range(w)
                )
            else:  # Paeth
                filt = bytearray()
                for i in range(w):
                    a = row[i - 1] if i else 0
                    c = prev[i - 1] if i else 0
                    b = prev[i]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                    filt.append((row[i] - pred) & 0xFF)
                filt = bytes(filt)
            out.append(bytes([ftype]) + filt)
            prev = row
        return out

    for ftype in range(5):
        got = png_pixels(_png(w, h, 0, rows_with(ftype)))
        assert got == (w, h, luma), f"filter {ftype}"


def test_truecolor_luma_matches_itu_formula():
    w, h = 2, 1
    px = [(255, 0, 0), (10, 200, 55)]
    row = b"\x00" + b"".join(bytes(t) for t in px)
    got = png_pixels(_png(w, h, 2, [row]))
    want = bytes(
        (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16 for r, g, b in px
    )
    assert got == (w, h, want)
    d = png_decoder(_png(w, h, 2, [row]))
    assert d["mode"] == "RGB" and d["sum_luma"] == sum(want)


def test_rejects_malformed_payloads():
    ok = encode_png(4, 4, bytes(range(16)))
    assert png_pixels(b"") is None
    assert png_pixels(b"\x89PNG\r\n\x1a\nnot-a-chunk") is None
    assert png_pixels(ok[:-20]) is None or png_pixels(ok[:-20]) == (
        4, 4, bytes(range(16)),
    )  # dropping IEND alone may still parse; corrupting IDAT must not:
    broken = bytearray(ok)
    broken[40] ^= 0xFF  # flip a byte inside the DEFLATE stream
    assert png_pixels(bytes(broken)) is None
    # interlaced flag -> declined
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x04"))
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(bad) is None
    # invalid filter type byte -> declined
    assert png_pixels(_png(2, 1, 0, [b"\x05\x01\x02"])) is None
    # wrong decompressed size -> declined
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    short = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x01"))
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(short) is None


def test_pure_decoder_magic_dispatch():
    from gmallrealtime02_spark.functions.multimodal import encode_bmp

    luma = bytes(range(64))
    png_d = pure_decoder(encode_png(8, 8, luma))
    bmp_d = pure_decoder(encode_bmp(8, 8, luma))
    assert png_d["mode"] == "L" and bmp_d["mode"] == "RGB"
    for k in ("width", "height", "n_pixels", "sum_luma", "pixel_digest"):
        assert png_d[k] == bmp_d[k], k  # same pixels either container
    assert pure_decoder(b"GIF89a....") is None
    assert media_pixels(encode_png(8, 8, luma)) == (8, 8, luma)


def test_pillow_parity_bit_exact():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from gmallrealtime02_spark.functions.multimodal import pillow_decoder

    luma = bytes((i * 53 + 7) % 256 for i in range(64))
    b = encode_png(8, 8, luma)
    ours, theirs = png_decoder(b), pillow_decoder(b)
    assert ours == theirs


def test_decode_media_over_png_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = as_png_media_table(docs)
    out = decode_media(media, decoder=png_decoder)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 8 and r.height == 8 and r.n_pixels == 64 for r in rows)
    # spot-check one doc analytically
    doc = docs.collect()[0]
    want = sum(min(ord(c), 255) for c in doc.text[:64]) + 0 * max(
        0, 64 - len(doc.text)
    )
    got = next(r.sum_luma for r in rows if r.doc_id == doc.doc_id)
    assert got == want
    # resize over the compressed container via the dispatching pixels fn
    thumb = resize_pixels(media, 4, 4, pixels=media_pixels).collect()
    assert all(t.sum_thumb is not None for t in thumb)


def test_ihdr_must_be_first_chunk():
    """The spec mandates IHDR first; accepting it anywhere would let a
    leading ancillary chunk shift the fixed IHDR offsets png_decoder's
    mode peek reads (silent wrong mode) — so such payloads decline."""
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    body = zlib.compress(b"\x00\x01\x02")
    shifted = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"tEXt", b"k\x00v")  # ancillary chunk before IHDR
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", body)
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(shifted) is None
    assert png_decoder(shifted) is None


# -- palette (color type 3) --------------------------------------------------

from gmallrealtime02_spark.functions.multimodal import (  # noqa: E402
    _PALETTE,
    _luma_601,
    as_png_palette_media_table,
    encode_png_palette,
)


def _pal_png(width, height, depth, palette, rows) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    plte = b"".join(bytes(rgb) for rgb in palette)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


def test_palette_roundtrip_resolves_plte():
    """Decoding an indexed PNG must resolve every index through PLTE
    and luma-convert the entry — the non-identity palette makes
    index==luma shortcuts fail loudly."""
    idx = bytes(range(64))
    b = encode_png_palette(8, 8, idx)
    w, h, luma = png_pixels(b)
    assert (w, h) == (8, 8)
    assert luma == bytes(_luma_601(*_PALETTE[i]) for i in idx)
    d = png_decoder(b)
    assert d["mode"] == "P"
    assert d["sum_luma"] == sum(_luma_601(*_PALETTE[i]) for i in idx)


@pytest.mark.parametrize("depth,packed", [
    (1, [0b10110010]),          # 8 one-bit pixels in one byte
    (2, [0b00011011, 0b11100100]),  # 8 two-bit pixels in two bytes
    (4, [0x01, 0x23, 0x45, 0x67]),  # 8 four-bit pixels in four bytes
])
def test_palette_sub_byte_depths_unpack_msb_first(depth, packed):
    pal = [(j * 16 % 256, j * 16 % 256, j * 16 % 256) for j in range(16)]
    b = _pal_png(8, 1, depth, pal, [b"\x00" + bytes(packed)])
    got = png_pixels(b)
    assert got is not None
    w, h, luma = got
    assert (w, h) == (8, 1)
    # recompute expected indices MSB-first
    bits = "".join(f"{byte:08b}" for byte in packed)
    idxs = [int(bits[i * depth : (i + 1) * depth], 2) for i in range(8)]
    assert list(luma) == [_luma_601(*pal[i]) for i in idxs]


def test_palette_rejects_corrupt_forms():
    pal4 = [(j, j, j) for j in range(4)]
    # out-of-palette index
    assert png_pixels(_pal_png(2, 1, 8, pal4, [b"\x00\x01\x09"])) is None
    # missing PLTE entirely
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    no_plte = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(no_plte) is None
    # PLTE length not a multiple of 3
    ihdr8 = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    bad_plte = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr8)
        + _chunk(b"PLTE", b"\x01\x02")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x01"))
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(bad_plte) is None
    # 16-bit palette depth is not a thing; 3-bit likewise invalid
    assert png_pixels(_pal_png(2, 1, 8, pal4, [b"\x00\x00"])) is None  # short row


def test_palette_filters_decode():
    """Scanline filters over index bytes (bpp=1) — Sub and Up round-trip
    through the palette path."""
    pal = _PALETTE
    #  row0: filter 1 (Sub): raw deltas; row1: filter 2 (Up): deltas vs row0
    row0 = b"\x01" + bytes([10, 5, 5, 5])   # -> 10,15,20,25
    row1 = b"\x02" + bytes([1, 1, 1, 1])    # -> 11,16,21,26
    b = _pal_png(4, 2, 8, pal, [row0, row1])
    got = png_pixels(b)
    assert got is not None
    _, _, luma = got
    want_idx = [10, 15, 20, 25, 11, 16, 21, 26]
    assert list(luma) == [_luma_601(*pal[i]) for i in want_idx]


def test_pillow_parity_palette_bit_exact():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from gmallrealtime02_spark.functions.multimodal import pillow_decoder

    idx = bytes((i * 37 + 3) % 256 for i in range(64))
    b = encode_png_palette(8, 8, idx)
    ours, theirs = png_decoder(b), pillow_decoder(b)
    assert ours == theirs


def test_decode_media_over_palette_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = as_png_palette_media_table(docs)
    out = decode_media(media, decoder=png_decoder).select(
        "doc_id", "width", "height", "n_pixels", "sum_luma"
    )
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.width == 8 and r.height == 8 and r.n_pixels == 64 for r in rows)
    # cross-check one doc against a local decode
    first = docs.orderBy("doc_id").first()
    idx = bytes(min(ord(c), 255) for c in first["text"][:64]).ljust(64, b"\x00")
    want = sum(_luma_601(*_PALETTE[i]) for i in idx)
    got = [r.sum_luma for r in rows if r.doc_id == first["doc_id"]]
    assert got == [want]


# -- Adam7 interlace ----------------------------------------------------------

from gmallrealtime02_spark.functions.multimodal import (  # noqa: E402
    _ADAM7,
    as_png_interlaced_media_table,
    encode_png_adam7,
)


def test_adam7_roundtrip_across_shapes():
    """Interlaced encode→decode is the identity for widths/heights that
    leave some passes EMPTY (w or h < 5) and ones that don't — empty
    passes contribute no rows at all per the spec."""
    from random import Random

    rng = Random(7)
    for (w, h) in [(8, 8), (1, 1), (2, 3), (5, 1), (1, 9), (16, 4), (9, 5)]:
        luma = bytes(rng.randrange(256) for _ in range(w * h))
        assert png_pixels(encode_png_adam7(w, h, luma)) == (w, h, luma), (w, h)


def test_adam7_pass_table_covers_each_pixel_exactly_once():
    """The spec pass table partitions the pixel grid — a wrong origin
    or step double-writes some pixels and never writes others."""
    for w, h in [(8, 8), (7, 5), (16, 16), (3, 3)]:
        seen = set()
        for x0, y0, dx, dy in _ADAM7:
            for y in range(y0, h, dy):
                for x in range(x0, w, dx):
                    assert (x, y) not in seen, (x, y)
                    seen.add((x, y))
        assert len(seen) == w * h


def test_adam7_interlaced_palette_decodes():
    """Interlace composes with PLTE indirection: each pass's indices
    resolve through the palette after the scatter."""
    from gmallrealtime02_spark.functions.multimodal import _PALETTE, _luma_601

    idx = bytes(range(16))
    w = h = 4
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        for yp in range(hp):
            y = y0 + yp * dy
            raw.append(0)
            raw.extend(idx[y * w + x0 + xp * dx] for xp in range(wp))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 1)
    plte = b"".join(bytes(rgb) for rgb in _PALETTE)
    b = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    want = bytes(_luma_601(*_PALETTE[i]) for i in idx)
    assert png_pixels(b) == (w, h, want)


def test_adam7_truncated_stream_rejected():
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1)
    short = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x01"))
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(short) is None


def test_pillow_parity_adam7_bit_exact():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from gmallrealtime02_spark.functions.multimodal import pillow_decoder

    luma = bytes((i * 29 + 11) % 256 for i in range(64))
    b = encode_png_adam7(8, 8, luma)
    assert png_decoder(b) == pillow_decoder(b)


def test_decode_media_over_interlaced_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    plain = decode_media(as_png_media_table(docs), decoder=png_decoder)
    inter = decode_media(
        as_png_interlaced_media_table(docs), decoder=png_decoder
    )
    cols = ["doc_id", "width", "height", "n_pixels", "sum_luma", "pixel_digest"]
    a = sorted(map(tuple, plain.select(cols).collect()))
    b = sorted(map(tuple, inter.select(cols).collect()))
    assert a == b  # interlacing is a lossless permutation


# -- gray+alpha (4) and RGBA (6) ----------------------------------------------

from gmallrealtime02_spark.functions.multimodal import (  # noqa: E402
    as_png_rgba_media_table,
    encode_png_rgba,
)


def test_rgba_alpha_dropped_not_composited():
    """RGBA decode must use the RGB channels only (Pillow's RGBA→L) —
    the varying synthetic alpha would shift every luma if composited
    or mis-strided."""
    from gmallrealtime02_spark.functions.multimodal import _PALETTE, _luma_601

    vals = bytes(range(64))
    b = encode_png_rgba(8, 8, vals)
    want = bytes(_luma_601(*_PALETTE[v]) for v in vals)
    assert png_pixels(b) == (8, 8, want)
    assert png_decoder(b)["mode"] == "RGBA"


def test_gray_alpha_decodes_gray_channel():
    pairs = [(v, (v * 7 + 1) % 256) for v in range(32)]
    raw = b"".join(
        b"\x00" + b"".join(bytes(p) for p in pairs[y * 8 : (y + 1) * 8])
        for y in range(4)
    )
    ihdr = struct.pack(">IIBBBBB", 8, 4, 8, 4, 0, 0, 0)
    b = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(b) == (8, 4, bytes(g for g, _a in pairs))
    assert png_decoder(b)["mode"] == "LA"


def test_rgba_interlaced_and_filtered_roundtrip():
    """Filters use bpp=4 offsets for RGBA; Sub over 4-channel pixels
    and the Adam7 scatter both preserve the channel layout."""
    from random import Random

    from gmallrealtime02_spark.functions.multimodal import _luma_601

    rng = Random(11)
    w, h = 6, 5
    px = [tuple(rng.randrange(256) for _ in range(4)) for _ in range(w * h)]
    # filter 1 (Sub) rows: emit deltas so decode must add prior PIXEL
    rows = bytearray()
    for y in range(h):
        rows.append(1)
        prev = (0, 0, 0, 0)
        for x in range(w):
            cur = px[y * w + x]
            rows += bytes((cur[i] - prev[i]) & 0xFF for i in range(4))
            prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    b = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _chunk(b"IEND", b"")
    )
    want = bytes(_luma_601(p[0], p[1], p[2]) for p in px)
    assert png_pixels(b) == (w, h, want)
    # interlaced RGBA: hand-scatter the same pixels
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        for yp in range(hp):
            y = y0 + yp * dy
            raw.append(0)
            for xp in range(wp):
                raw.extend(bytes(px[y * w + x0 + xp * dx]))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 1)
    bi = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert png_pixels(bi) == (w, h, want)


def test_pillow_parity_rgba_bit_exact():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from gmallrealtime02_spark.functions.multimodal import pillow_decoder

    vals = bytes((i * 41 + 5) % 256 for i in range(64))
    b = encode_png_rgba(8, 8, vals)
    assert png_decoder(b) == pillow_decoder(b)


def test_decode_media_over_rgba_table(spark, sf_dir):
    """The RGBA twin's decoded stats equal the palette twin's — same
    value→RGB mapping, alpha ignored."""
    docs = load_table(spark, sf_dir, "documents").limit(40)
    from gmallrealtime02_spark.functions.multimodal import (
        as_png_palette_media_table,
    )

    pal = decode_media(as_png_palette_media_table(docs), decoder=png_decoder)
    rgba = decode_media(as_png_rgba_media_table(docs), decoder=png_decoder)
    cols = ["doc_id", "width", "height", "n_pixels", "sum_luma", "pixel_digest"]
    assert sorted(map(tuple, pal.select(cols).collect())) == sorted(
        map(tuple, rgba.select(cols).collect())
    )


# -- 16-bit samples ---------------------------------------------------------

from gmallrealtime02_spark.functions.multimodal import (  # noqa: E402
    as_png_16bit_media_table,
    encode_png_16bit,
)


def test_16bit_roundtrip_high_byte():
    """encode_png_16bit stores ((251v+17)%256)<<8 | ((193v+89)%256);
    the decode must narrow each big-endian sample to its HIGH byte."""
    vals = bytes(range(64))
    got = png_pixels(encode_png_16bit(8, 8, vals))
    assert got is not None
    w, h, px = got
    assert (w, h) == (8, 8)
    assert px == bytes((251 * v + 17) % 256 for v in vals)
    d = png_decoder(encode_png_16bit(8, 8, vals))
    assert d["mode"] == "I;16"
    assert d["sum_luma"] == sum((251 * v + 17) % 256 for v in vals)


def test_16bit_filters_defilter_at_two_byte_stride():
    """Sub/Up/Paeth on a depth-16 gray image: the filter offset is the
    2-byte sample width, not 1 — expected bytes built by applying the
    spec forward over the raw two-byte stream."""
    w = h = 3
    samples = [(v << 8) | ((7 * v + 3) % 256) for v in (10, 20, 30, 40, 50, 60, 70, 80, 90)]
    raw_rows = []
    for y in range(h):
        rb = bytearray()
        for s in samples[y * w : (y + 1) * w]:
            rb += bytes(((s >> 8) & 0xFF, s & 0xFF))
        raw_rows.append(bytes(rb))
    stride, bpp = 2 * w, 2

    for ftype in (0, 1, 2, 3, 4):
        out = bytearray()
        prev = bytes(stride)
        for row in raw_rows:
            filt = bytearray()
            for i in range(stride):
                x = row[i]
                a = row[i - bpp] if i >= bpp else 0
                b_ = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 0:
                    filt.append(x)
                elif ftype == 1:
                    filt.append((x - a) & 0xFF)
                elif ftype == 2:
                    filt.append((x - b_) & 0xFF)
                elif ftype == 3:
                    filt.append((x - ((a + b_) >> 1)) & 0xFF)
                else:
                    p = a + b_ - c
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                    filt.append((x - pred) & 0xFF)
            out += bytes([ftype]) + bytes(filt)
            prev = row

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b"")
        )
        got = png_pixels(png)
        assert got is not None, f"filter {ftype} rejected"
        assert got[2] == bytes(s >> 8 for s in samples), f"filter {ftype}"


def test_16bit_truncated_and_odd_streams_rejected():
    good = encode_png_16bit(4, 4, bytes(range(16)))
    # strip the IEND and truncate the IDAT payload: short stream
    assert png_pixels(good[:-20]) is None
    # an 8-bit-sized stream under a 16-bit header must not decode
    import zlib as _z

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
        )

    short = b"".join(
        bytes([0]) + bytes(range(4)) for _ in range(4)
    )  # 1 byte/px
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(short))
        + chunk(b"IEND", b"")
    )
    assert png_pixels(png) is None


def test_decode_media_over_16bit_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = as_png_16bit_media_table(docs)
    from gmallrealtime02_spark.functions.multimodal import decode_media

    out = decode_media(media, decoder=png_decoder).select(
        "doc_id", "width", "height", "sum_luma"
    )
    rows = {r.doc_id: r for r in out.collect()}
    for d in docs.collect():
        vals = [min(ord(c), 255) for c in d.text[:64]]
        vals += [0] * (64 - len(vals))
        want = sum((251 * v + 17) % 256 for v in vals)
        assert rows[d.doc_id].sum_luma == want
        assert (rows[d.doc_id].width, rows[d.doc_id].height) == (8, 8)


def test_16bit_adam7_interlaced_decodes():
    """Depth-16 + Adam7 composed: each reduced image defilters at the
    2-byte stride and scatters two-byte samples back to the grid; the
    decode must equal the plain 16-bit twin pixel-for-pixel."""
    from gmallrealtime02_spark.functions.multimodal import _ADAM7

    w, h = 8, 8
    vals = bytes((v * 37 + 5) % 256 for v in range(w * h))
    samples = [(((251 * v + 17) % 256) << 8) | ((193 * v + 89) % 256) for v in vals]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        for yp in range(hp):
            y = y0 + yp * dy
            raw.append(0)  # filter: None
            for xp in range(wp):
                s = samples[y * w + x0 + xp * dx]
                raw += bytes(((s >> 8) & 0xFF, s & 0xFF))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = png_pixels(png)
    assert got is not None
    plain = png_pixels(encode_png_16bit(w, h, vals))
    assert got == plain
    assert got[2] == bytes((251 * v + 17) % 256 for v in vals)


def test_pillow_parity_16bit_high_byte_narrowing():
    """Parity gate for the round-10 16-bit path (round-11 verdict item
    1: every newly decoded format pins pure-vs-Pillow agreement).
    Pillow opens depth-16 gray PNGs as 16-bit integer samples, so the
    libpng png_set_strip_16 narrowing our decoder applies is the
    explicit >>8 here — asserting both the sample values and the
    narrowed luma bit-for-bit."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    vals = bytes((v * 37 + 5) % 256 for v in range(64))
    b = encode_png_16bit(8, 8, vals)
    im = PIL.open(io.BytesIO(b))
    assert im.size == (8, 8)
    theirs16 = list(im.getdata())
    expect16 = [
        (((251 * v + 17) % 256) << 8) | ((193 * v + 89) % 256) for v in vals
    ]
    assert theirs16 == expect16
    got = png_pixels(b)
    assert got is not None
    assert list(got[2]) == [s >> 8 for s in theirs16]
