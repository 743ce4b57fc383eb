"""Pure-Python BMP codec: encode/decode round-trips, format-edge
handling (top-down rows, stride padding, truncation, non-BMP bytes),
Pillow bit-parity where Pillow ships, and the decoded resize/scanline
content gates that make media_resize/media_frames' decode path
verifiable in this sandbox."""

from __future__ import annotations

import hashlib

import pytest

from gmallrealtime02_spark.functions.multimodal import (
    as_bmp_media_table,
    bmp_decoder,
    bmp_pixels,
    encode_bmp,
    resize_pixels,
    sample_scanlines,
)
from gmallrealtime02_spark.sources import load_table


def test_encode_decode_roundtrip_exact():
    """Gray (v,v,v) pixels survive encode→decode bit-exact (the property
    the hash oracles rely on), across widths that need stride padding."""
    for w, h in [(8, 8), (5, 3), (1, 1), (7, 2)]:
        luma = bytes((i * 37 + 11) % 256 for i in range(w * h))
        parsed = bmp_pixels(encode_bmp(w, h, luma))
        assert parsed == (w, h, luma), (w, h)


def test_decoder_feature_dict():
    luma = bytes(range(64))
    d = bmp_decoder(encode_bmp(8, 8, luma))
    assert (d["width"], d["height"], d["mode"]) == (8, 8, "RGB")
    assert d["n_pixels"] == 64
    assert d["sum_luma"] == sum(luma) == 2016
    assert d["mean_luma"] == round(2016 / 64, 6)
    assert d["pixel_digest"] == hashlib.md5(luma).hexdigest()


def test_top_down_bmp_decodes_same_pixels():
    """A negative-height (top-down) BMP yields the same row-major pixels
    as the bottom-up encoding of the same image."""
    import struct

    luma = bytes((i * 53) % 256 for i in range(4 * 2))
    b = bytearray(encode_bmp(4, 2, luma))
    # flip to top-down: negate height, reverse the stored row order
    struct.pack_into("<i", b, 22, -2)
    offset = struct.unpack_from("<I", b, 10)[0]
    stride = (4 * 3 + 3) & ~3
    rows = [bytes(b[offset + i * stride : offset + (i + 1) * stride])
            for i in range(2)]
    b[offset:] = rows[1] + rows[0]
    assert bmp_pixels(bytes(b)) == (4, 2, luma)


def test_undecodable_payloads_return_none():
    assert bmp_decoder(b"not a bitmap at all, just text") is None
    assert bmp_decoder(b"BM" + b"\x00" * 10) is None  # too short
    # truncated pixel data
    good = encode_bmp(8, 8, bytes(64))
    assert bmp_decoder(good[:-10]) is None
    # unsupported: compressed flag set
    import struct

    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    assert bmp_decoder(bytes(bad)) is None


def test_luma_matches_pillow_where_available():
    """The fallback's RGB→L integer formula is Pillow's exact one; where
    Pillow ships, both decoders agree bit-for-bit on a 24-bit BMP with
    non-gray pixels (skipped in codec-free sandboxes)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        pytest.skip("Pillow not available in this environment")
    import io
    import struct

    from gmallrealtime02_spark.functions.multimodal import pillow_decoder

    # hand-build a BMP with truly colored pixels (not gray triples)
    w, h = 4, 2
    stride = (w * 3 + 3) & ~3
    pix = bytes(
        ((x * 91 + y * 57 + c * 31) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    rows = [pix[y * w * 3 : (y + 1) * w * 3].ljust(stride, b"\x00")
            for y in range(h - 1, -1, -1)]
    data = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    payload = hdr + data
    ours, theirs = bmp_decoder(payload), pillow_decoder(payload)
    assert theirs is not None
    assert ours["pixel_digest"] == theirs["pixel_digest"]
    assert ours["sum_luma"] == theirs["sum_luma"]
    assert (ours["width"], ours["height"]) == (theirs["width"], theirs["height"])


def test_resize_pixels_nearest_neighbor_content(spark, sf_dir):
    """4x4 NN thumbnails of the synthesized 8x8 BMPs contain exactly the
    source pixels at (2x, 2y) — checked against a Python recompute from
    the raw text."""
    docs = load_table(spark, sf_dir, "documents").limit(25)
    out = {r.doc_id: r for r in resize_pixels(
        as_bmp_media_table(docs), 4, 4).collect()}
    for row in docs.select("doc_id", "text").collect():
        luma = bytes(min(ord(c), 255) for c in row.text[:64]).ljust(64, b"\x00")
        want = bytes(luma[16 * y + 2 * x] for y in range(4) for x in range(4))
        r = out[row.doc_id]
        assert bytes(r.thumb) == want
        assert r.sum_thumb == sum(want)
        assert r.thumb_digest == hashlib.md5(want).hexdigest()
        assert (r.src_width, r.src_height) == (8, 8)


def test_resize_pixels_null_row_for_undecodable(spark, sf_dir):
    from gmallrealtime02_spark.functions.multimodal import as_media_table

    docs = load_table(spark, sf_dir, "documents").limit(3)
    out = resize_pixels(as_media_table(docs), 4, 4).collect()
    assert len(out) == 3 and all(r.thumb is None and r.sum_thumb is None
                                 for r in out)


def test_sample_scanlines_content(spark, sf_dir):
    """Every 4th decoded row (0 and 4 of the 8x8 plane) fans out with the
    exact source bytes; undecodable payloads contribute zero rows."""
    docs = load_table(spark, sf_dir, "documents").limit(25)
    got: dict[tuple, object] = {}
    for r in sample_scanlines(as_bmp_media_table(docs), every_n=4).collect():
        got[(r.doc_id, r.row_idx)] = r
    for row in docs.select("doc_id", "text").collect():
        luma = bytes(min(ord(c), 255) for c in row.text[:64]).ljust(64, b"\x00")
        for y in (0, 4):
            r = got.pop((row.doc_id, y))
            want = luma[y * 8 : (y + 1) * 8]
            assert bytes(r.scanline) == want and r.sum_row == sum(want)
    assert not got  # nothing beyond rows 0 and 4
