"""Multimodal (image/audio/video) column plumbing (north-star ops).

Media is modeled as opaque ``binary`` content columns + a typed metadata
struct.  The Spark-side machinery — schema, partition-preserving
``mapInPandas`` with Arrow batches, deterministic feature extraction — is
real and tested, and so is the decode path for self-contained formats:
``decode_media`` uses in-repo pure-Python codecs (``bmp_decoder`` for
uncompressed 24-bit BMP, ``png_decoder`` for 8-bit gray/truecolor and
1/2/4/8-bit palette PNG, plain or Adam7-interlaced, via stdlib zlib)
by default, upgrading to Pillow when it is
importable (bit-parity between the two is pinned in tests).  Payloads
in formats no available codec handles decode to NULL rows — a data
outcome, never a task failure.

At 100 TB: media rows are large, so the operators use ``mapInPandas``
(streaming Arrow batches, bounded memory) rather than ``applyInPandas``
(whole-group materialization), and never shuffle the binary payload —
features are extracted scan-side, then only the small feature columns
move.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, content binary, media_type string, n_bytes long"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, byte_entropy double, "
    "first_byte int, last_byte int"
)


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text table as a media table (utf-8 bytes as the opaque
    payload) — the plumbing fixture standing in for real image/audio
    ingestion."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def _spread(docs: DataFrame, text_col: str) -> DataFrame:
    """Narrow (doc_id, text) projection spread across the cores before
    the per-image Python encode→decode chain.  The local testdata
    parquet is ONE row group, so without this the whole synthetic
    encoder AND the decoder under test ran on a single task — the
    sweep read media_jpeg_progressive at 16.8 s while the (persisted,
    64-way) --stress twin decodes the same class at 16k imgs/s.  At
    100 TB the scan arrives pre-split and ``ensure_parallelism`` is a
    no-op; the conditional exchange carries only the tiny projection,
    never payloads."""
    from ..sources.tables import ensure_parallelism

    return ensure_parallelism(docs.select("doc_id", text_col))


def _entropy(b: bytes) -> float:
    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return round(-sum((c / n) * math.log2(c / n) for c in counts.values()), 6)


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic per-item byte-level features via Arrow-batched
    ``mapInPandas`` (the shape a real decode/resize/frame-sample UDF
    takes: Iterator[pd.DataFrame] → Iterator[pd.DataFrame])."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "digest": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "byte_entropy": content.map(lambda b: _entropy(bytes(b))),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": content.map(lambda b: b[-1] if len(b) else -1),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "thumb binary, thumb_bytes long"
)


def resize_media(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic stand-in for image resize: the payload is strided
    down to exactly ``width*height`` bytes (a real resizer plugs into the
    same ``mapInPandas`` slot with the same 1→1 batch shape and typed
    output metadata).  Payloads shorter than the target are zero-padded —
    output size is schema-stable, as a real thumbnail's would be."""
    target = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _thumb(b: bytes) -> bytes:
                b = bytes(b)
                if len(b) >= target:
                    stride = len(b) // target
                    out = b[:: stride][:target]
                else:
                    out = b
                return out + b"\x00" * (target - len(out))

            thumbs = pdf["content"].map(_thumb)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                    "thumb_bytes": thumbs.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_digest string"

FRAME_SIZE = 256


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Deterministic stand-in for video frame sampling: the payload is
    treated as consecutive ``FRAME_SIZE``-byte frames and every
    ``every_n``-th frame is emitted as its own row — the 1→N batch shape
    (one media row fans out to many frame rows) a real ``av``-based
    sampler uses.  Frames never shuffle: sampling is scan-side and only
    the sampled frames (1/every_n of the bytes) continue downstream."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, digests = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                n_frames = (len(b) + FRAME_SIZE - 1) // FRAME_SIZE
                for fi in range(0, n_frames, every_n):
                    fr = b[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE]
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(fr)
                    digests.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_digest": digests,
                }
            )

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


DECODED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, mode string, "
    "n_pixels long, sum_luma long, mean_luma double, pixel_digest string"
)


# ---------------------------------------------------------------------------
# Pure-Python uncompressed-BMP codec (the no-Pillow fallback)
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, luma: bytes) -> bytes:
    """Build a 24-bit uncompressed bottom-up BMP whose pixels are the
    grayscale ``luma`` bytes replicated to B=G=R (row-major, top-left
    first; must hold exactly width*height bytes).  Deterministic fixture
    generator for the decode tests and the BMP-roundtrip queries — gray
    (v,v,v) converts back to luma exactly v under the ITU-R 601-2
    formula, so encode→decode round-trips bit-exact."""
    import struct

    if len(luma) != width * height:
        raise ValueError("luma must hold width*height bytes")
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = luma[y * width : (y + 1) * width]
        rows.append(b"".join(bytes((v, v, v)) for v in row) + pad)
    pixel_data = b"".join(rows)
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    return header + pixel_data


def bmp_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER or larger DIB,
    BI_RGB, bottom-up or top-down) into (width, height, luma bytes in
    row-major top-left order).  Returns None for anything else — like
    ``pillow_decoder``, an undecodable payload must pass through as a
    null row, never kill a 10⁶-row partition.

    Luma uses Pillow's exact RGB→L integer formula
    ``(r*19595 + g*38470 + b*7471 + 0x8000) >> 16`` (ITU-R 601-2 scaled
    to 2^16), so where Pillow IS available the two decoders agree
    bit-for-bit on 24-bit BMPs (parity-pinned in pytest)."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        return None
    offset = struct.unpack_from("<I", b, 10)[0]
    dib = struct.unpack_from("<I", b, 14)[0]
    if dib < 40:  # BITMAPCOREHEADER etc. — out of scope
        return None
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if offset + stride * height > len(b):
        return None  # truncated payload
    out = bytearray(width * height)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = offset + src_y * stride
        for x in range(width):
            bb = b[base + 3 * x]
            gg = b[base + 3 * x + 1]
            rr = b[base + 3 * x + 2]
            out[y * width + x] = (
                rr * 19595 + gg * 38470 + bb * 7471 + 0x8000
            ) >> 16
    return width, height, bytes(out)


def bmp_decoder(b: bytes) -> dict | None:
    """Pure-Python decode of uncompressed 24-bit BMPs → the same
    grayscale feature dict as :func:`pillow_decoder` (mode reported as
    "RGB", what Pillow reports for a 24-bit BMP).  The default decoder
    when Pillow is absent: one real, verifiable format with zero
    dependencies — compressed formats still need a codec library."""
    parsed = bmp_pixels(bytes(b))
    if parsed is None:
        return None
    width, height, px = parsed
    n = len(px)
    return {
        "width": width,
        "height": height,
        "mode": "RGB",
        "n_pixels": n,
        "sum_luma": sum(px),
        "mean_luma": round(sum(px) / n, 6) if n else 0.0,
        "pixel_digest": hashlib.md5(px).hexdigest(),
    }


def encode_png(width: int, height: int, luma: bytes) -> bytes:
    """Build an 8-bit grayscale non-interlaced PNG (filter 0 per row,
    stdlib zlib) from row-major ``luma`` bytes — the compressed-format
    counterpart of :func:`encode_bmp`, same analytic-oracle property:
    gray pixel v decodes back to luma exactly v."""
    import struct
    import zlib

    if len(luma) != width * height:
        raise ValueError("luma must hold width*height bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + luma[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _luma_601(rr: int, gg: int, bb: int) -> int:
    """ITU-R 601-2 integer luma — the exact formula Pillow's RGB→L
    uses, shared by the BMP, truecolor-PNG and palette-PNG paths."""
    return (rr * 19595 + gg * 38470 + bb * 7471 + 0x8000) >> 16


#: Adam7 interlace passes: (x0, y0, dx, dy) — pass p covers the full-
#: image pixels at (x0 + i*dx, y0 + j*dy), stored in the IDAT stream as
#: seven independently-filtered reduced images in this order.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def png_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """Parse a non-interlaced OR Adam7-interlaced grayscale (color
    type 0), truecolor (2), PALETTE (3, bit depth 1/2/4/8 — the
    indexed form common in real web-scraped corpora), gray+alpha (4),
    or RGBA (6) PNG — 8-bit or 16-bit samples (depths 1/2/4/8 for
    palette) — into (width, height, luma bytes row-major) — a REAL
    decoder for a REAL compressed format with zero dependencies: chunk
    walk with length checks, zlib inflate of the concatenated IDAT
    stream, all five scanline filters (None/Sub/Up/Average/Paeth)
    undone per the spec (per reduced image for Adam7 — each of the
    seven passes filters independently, at the 2-byte-per-sample
    stride for depth 16), PLTE indirection (sub-byte indices unpacked
    MSB-first), 16-bit samples narrowed to their high byte (libpng's
    png_set_strip_16), and truecolor/palette RGB converted to luma
    with the same ITU-R 601-2 integer formula as the BMP path, so
    Pillow (where it ships) agrees bit-for-bit on the 8-bit matrix.
    Returns None for anything else — truncated, out-of-palette
    indices, or corrupt payloads pass through as null rows, never a
    task failure."""
    import struct
    import zlib

    b = bytes(b)
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    width = height = ctype = depth = inter = None
    idat = bytearray()
    plte = None
    first_chunk = True
    try:
        while pos + 8 <= len(b):
            (ln,) = struct.unpack_from(">I", b, pos)
            tag = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + ln]
            if len(data) < ln:
                return None  # truncated chunk
            pos += 12 + ln
            if first_chunk:
                # the spec mandates IHDR first; enforcing it also pins
                # the fixed IHDR byte offsets png_decoder's mode peek
                # relies on
                if tag != b"IHDR":
                    return None
                first_chunk = False
            if tag == b"IHDR":
                (width, height, depth, ctype, comp, filt, inter) = (
                    struct.unpack(">IIBBBBB", data)
                )
                ok_depth = (
                    depth in (1, 2, 4, 8)
                    if ctype == 3
                    else depth in (8, 16)
                )
                if (
                    not ok_depth
                    or ctype not in (0, 2, 3, 4, 6)
                    or comp != 0
                    or filt != 0
                    or inter not in (0, 1)
                ):
                    return None
            elif tag == b"PLTE":
                if ln == 0 or ln % 3 or idat:
                    return None  # malformed, or after IDAT (spec order)
                plte = data
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
        if width is None or width <= 0 or height <= 0 or not idat:
            return None
        if ctype == 3 and plte is None:
            return None  # indexed image with no palette
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error):
        return None
    # bytes per pixel for filter offsets (sub-byte depths filter
    # byte-wise with bpp=1 per the spec); row stride depends on width
    # samples per pixel: gray 1, gray+alpha 2, RGB 3, RGBA 4,
    # palette 1 (index byte); 16-bit samples are TWO bytes each
    # (big-endian), so the filter offset doubles with them
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype] * (
        2 if depth == 16 else 1
    )

    def row_stride(w: int) -> int:
        return (w * depth + 7) // 8 if ctype == 3 else w * bpp

    def defilter(pos: int, w: int, h: int):
        """Undo the five scanline filters over one (sub-)image of
        ``h`` rows of ``row_stride(w)`` bytes starting at ``pos`` in
        the inflated stream; returns (rows, next_pos) or None."""
        stride = row_stride(w)
        prev = bytearray(stride)
        rows = []
        for _y in range(h):
            if pos >= len(raw) or len(raw) - pos - 1 < stride:
                return None  # short stream
            ftype = raw[pos]
            row = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            if ftype == 1:  # Sub
                for i in range(bpp, stride):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    a = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    a = row[i - bpp] if i >= bpp else 0
                    c = prev[i - bpp] if i >= bpp else 0
                    up = prev[i]
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                    )
                    row[i] = (row[i] + pred) & 0xFF
            elif ftype != 0:
                return None  # invalid filter type
            rows.append(row)
            prev = row
        return rows, pos

    ppb = 8 // depth  # pixels per byte (1 for depth 8)
    mask = (1 << depth) - 1

    def unpack_indices(row: bytearray, w: int) -> list[int]:
        return [
            (row[x // ppb] >> (8 - depth * (x % ppb + 1))) & mask
            for x in range(w)
        ]

    # decode into a full-size sample plane (indices for ctype 3,
    # luma bytes for 0, interleaved RGB for 2)
    plane = bytearray(width * height * bpp)
    if inter == 0:
        got = defilter(0, width, height)
        if got is None or got[1] != len(raw):
            return None
        rows, _ = got
        if ctype == 3:
            for y, row in enumerate(rows):
                plane[y * width : (y + 1) * width] = bytes(
                    unpack_indices(row, width)
                )
        else:
            for y, row in enumerate(rows):
                plane[y * width * bpp : (y + 1) * width * bpp] = row
    else:  # Adam7: seven independently-filtered reduced images
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue  # empty pass: contributes no rows at all
            got = defilter(pos, wp, hp)
            if got is None:
                return None
            rows, pos = got
            for yp, row in enumerate(rows):
                samples = (
                    unpack_indices(row, wp) if ctype == 3 else row
                )
                y = y0 + yp * dy
                for xp in range(wp):
                    x = x0 + xp * dx
                    if bpp > 1:
                        base = (y * width + x) * bpp
                        plane[base : base + bpp] = row[
                            bpp * xp : bpp * (xp + 1)
                        ]
                    else:
                        plane[y * width + x] = samples[xp]
        if pos != len(raw):
            return None
    if depth == 16:
        # 16→8: keep each big-endian sample's HIGH byte — libpng's
        # png_set_strip_16 convention (the low byte carries <1/256 of
        # the intensity); the defilter above already ran at the 2-byte
        # stride, so this is a pure post-filter sample narrowing
        plane = plane[0::2]
        bpp //= 2
    if ctype == 0:
        return width, height, bytes(plane)
    if ctype == 4:  # gray + alpha: luma IS the gray sample (alpha
        # dropped — Pillow's LA->L does the same, no compositing)
        return width, height, bytes(plane[0::2])
    if ctype in (2, 6):
        luma = bytearray(width * height)
        for j in range(width * height):
            luma[j] = _luma_601(
                plane[bpp * j], plane[bpp * j + 1], plane[bpp * j + 2]
            )
        return width, height, bytes(luma)
    # ctype 3: resolve indices through the palette
    n_entries = len(plte) // 3
    pal_luma = bytes(
        _luma_601(plte[3 * j], plte[3 * j + 1], plte[3 * j + 2])
        for j in range(n_entries)
    )
    if max(plane) >= n_entries:
        return None  # out-of-palette index: corrupt
    return width, height, bytes(pal_luma[i] for i in plane)


def png_decoder(b: bytes) -> dict | None:
    """Pure-Python decode of PNGs → the same grayscale feature dict
    as :func:`pillow_decoder` (mode "L"/"LA"/"RGB"/"RGBA"/"P" — what
    Pillow reports)."""
    b = bytes(b)
    parsed = png_pixels(b)
    if parsed is None:
        return None
    width, height, px = parsed
    n = len(px)
    # IHDR depth/color type sit at fixed offsets 24/25 (validated above)
    mode = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}[b[25]]
    if b[24] == 16 and b[25] == 0:
        mode = "I;16"  # Pillow opens 16-bit grayscale as I;16, not L
    return {
        "width": width,
        "height": height,
        "mode": mode,
        "n_pixels": n,
        "sum_luma": sum(px),
        "mean_luma": round(sum(px) / n, 6) if n else 0.0,
        "pixel_digest": hashlib.md5(px).hexdigest(),
    }


def media_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """Magic-byte dispatch over the pure-Python codecs: BMP or PNG →
    (width, height, luma); anything else → None.  The ``pixels=`` slot
    for resize/scanline operators over mixed-format media columns."""
    b = bytes(b)
    if b[:2] == b"BM":
        return bmp_pixels(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return png_pixels(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import jpeg_pixels

        return jpeg_pixels(b)
    return None


def pure_decoder(b: bytes) -> dict | None:
    """Magic-byte dispatch over the pure-Python decoders (BMP + PNG +
    baseline JPEG) — the no-Pillow default for :func:`decode_media`.
    Formats without an in-repo codec decode as null rows."""
    b = bytes(b)
    if b[:2] == b"BM":
        return bmp_decoder(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decoder(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decoder

        return jpeg_decoder(b)
    return None


def pillow_decoder(b: bytes) -> dict | None:
    """Pillow-backed image decode → grayscale pixel features.  Returns
    None for payloads Pillow cannot open (non-image media rows pass
    through as null-featured rows rather than failing the task — at
    100 TB a single corrupt file must not kill a 10⁶-row partition)."""
    import io

    from PIL import Image, UnidentifiedImageError

    try:
        with Image.open(io.BytesIO(b)) as im:
            gray = im.convert("L")
            px = gray.tobytes()
            n = len(px)
            return {
                "width": gray.width,
                "height": gray.height,
                "mode": im.mode,
                "n_pixels": n,
                "sum_luma": sum(px),
                "mean_luma": round(sum(px) / n, 6) if n else 0.0,
                "pixel_digest": hashlib.md5(px).hexdigest(),
            }
    except (UnidentifiedImageError, OSError):
        return None


def decode_media(media: DataFrame, decoder=None) -> DataFrame:
    """Decode binary payloads into typed pixel features via the same
    Arrow ``mapInPandas`` slot as ``extract_features`` (1→1, binary never
    shuffles — only the small decoded-feature columns continue
    downstream).

    ``decoder`` is ``bytes -> dict | None`` (None = undecodable row,
    emitted with null features).  Defaults to the Pillow image decoder
    when Pillow is importable, else to the pure-Python
    :func:`pure_decoder` (uncompressed 24-bit BMP + non-interlaced
    8-bit PNG; parity with Pillow is bit-exact on both formats,
    parity-pinned in pytest where Pillow exists).  Other formats
    without Pillow decode as null rows — pass ``decoder=`` explicitly
    to plug in a codec."""
    if decoder is None:
        try:
            import PIL  # noqa: F401

            decoder = pillow_decoder
        except ImportError:
            decoder = pure_decoder

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        null_row = {
            "width": None,
            "height": None,
            "mode": None,
            "n_pixels": None,
            "sum_luma": None,
            "mean_luma": None,
            "pixel_digest": None,
        }
        for pdf in batches:
            decoded = [
                decoder(bytes(b)) or null_row for b in pdf["content"]
            ]
            out = pd.DataFrame(decoded)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            out["n_pixels"] = out["n_pixels"].astype("Int64")
            out["sum_luma"] = out["sum_luma"].astype("Int64")
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.mapInPandas(op, schema=DECODED_SCHEMA)


BMP_W = 8
BMP_H = 8


def as_bmp_media_table(
    docs: DataFrame,
    width: int = BMP_W,
    height: int = BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """Synthesize a REAL image table: each document's first
    ``width*height`` codepoints (clamped to 255, zero-padded) become the
    grayscale pixels of an uncompressed 24-bit BMP.  Gives the
    decode/resize/scanline operators an actually-decodable format whose
    expected features are analytically recomputable from the text —
    which is what makes the decode path hash-ORACLED: the DuckDB oracle
    applies the same clamp/pad fold over codepoints, no BMP parser
    needed (gray (v,v,v) → luma v exactly, see :func:`encode_bmp`)."""
    n = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                luma = bytes(min(ord(c), 255) for c in t[:n]).ljust(n, b"\x00")
                payloads.append(encode_bmp(width, height, luma))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/bmp",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def as_png_media_table(
    docs: DataFrame,
    width: int = BMP_W,
    height: int = BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """:func:`as_bmp_media_table`'s compressed twin: the same clamped/
    zero-padded codepoint pixels, DEFLATE-compressed into a real 8-bit
    grayscale PNG.  The decode oracle is identical — the compression is
    lossless, so the analytic codepoint fold still predicts every
    decoded statistic exactly."""
    n = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                luma = bytes(min(ord(c), 255) for c in t[:n]).ljust(n, b"\x00")
                payloads.append(encode_png(width, height, luma))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/png",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


#: deterministic non-identity 256-entry palette for the synthesized
#: indexed PNGs: entry j → RGB((3j+7)%256, (5j+11)%256, (7j+13)%256).
#: Non-identity so the oracle proves the PLTE INDIRECTION, not just
#: that index == luma; closed-form so DuckDB recomputes the expected
#: luma analytically.
_PALETTE = [
    ((3 * j + 7) % 256, (5 * j + 11) % 256, (7 * j + 13) % 256)
    for j in range(256)
]


def encode_png_palette(
    width: int, height: int, indices: bytes, palette: list | None = None
) -> bytes:
    """Build an 8-bit PALETTE (color type 3) non-interlaced PNG: PLTE
    from ``palette`` (default :data:`_PALETTE`), filter-0 rows of raw
    indices, stdlib zlib — the indexed counterpart of
    :func:`encode_png`, giving the palette decode path an in-sandbox
    analytic oracle."""
    import struct
    import zlib

    if len(indices) != width * height:
        raise ValueError("indices must hold width*height bytes")
    pal = _PALETTE if palette is None else palette

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    plte = b"".join(bytes(rgb) for rgb in pal)
    raw = b"".join(
        b"\x00" + indices[y * width : (y + 1) * width]
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def encode_png_adam7(width: int, height: int, luma: bytes) -> bytes:
    """Build an Adam7-INTERLACED 8-bit grayscale PNG (filter 0 per
    reduced-image row, stdlib zlib): the seven passes are emitted in
    spec order, each holding the full-image pixels at (x0+i·dx,
    y0+j·dy).  Interlacing is a lossless pixel PERMUTATION, so the
    same analytic codepoint oracle predicts every decoded statistic —
    the round-trip proves the deinterlace scatter, not just headers."""
    import struct
    import zlib

    if len(luma) != width * height:
        raise ValueError("luma must hold width*height bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue  # empty pass emits no rows at all
        for yp in range(hp):
            y = y0 + yp * dy
            raw.append(0)  # filter: None
            raw.extend(luma[y * width + x0 + xp * dx] for xp in range(wp))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


def as_png_interlaced_media_table(
    docs: DataFrame,
    width: int = BMP_W,
    height: int = BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """:func:`as_png_media_table`'s Adam7 twin: the same clamped/
    zero-padded codepoint pixels, stored INTERLACED — decoding must
    defilter seven independent reduced images and scatter each pass
    back to its (x0+i·dx, y0+j·dy) positions; the permutation is
    lossless, so the analytic oracle is unchanged."""
    n = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                luma = bytes(min(ord(c), 255) for c in t[:n]).ljust(n, b"\x00")
                payloads.append(encode_png_adam7(width, height, luma))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/png",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def encode_png_rgba(width: int, height: int, values: bytes) -> bytes:
    """Build an 8-bit RGBA (color type 6) non-interlaced PNG where
    pixel value v carries RGB((3v+7)%256, (5v+11)%256, (7v+13)%256) —
    the same non-identity mapping as :data:`_PALETTE` — and a VARYING
    alpha ((11v+29)%256), so a decoder that composites or mis-strides
    the alpha channel fails the analytic oracle (correct behavior:
    alpha dropped, exactly Pillow's RGBA→L)."""
    import struct
    import zlib

    if len(values) != width * height:
        raise ValueError("values must hold width*height bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    rows = bytearray()
    for y in range(height):
        rows.append(0)  # filter: None
        for v in values[y * width : (y + 1) * width]:
            r, g, b = _PALETTE[v]
            rows += bytes((r, g, b, (11 * v + 29) % 256))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows), 9))
        + chunk(b"IEND", b"")
    )


def as_png_rgba_media_table(
    docs: DataFrame,
    width: int = BMP_W,
    height: int = BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """RGBA twin of :func:`as_png_palette_media_table`: the same
    clamped/zero-padded codepoints drive the same value→RGB mapping,
    stored as explicit 4-channel pixels with varying alpha — so the
    palette query's oracle arithmetic predicts this decode too, and
    any alpha mishandling breaks the hash."""
    n = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                vals = bytes(min(ord(c), 255) for c in t[:n]).ljust(n, b"\x00")
                payloads.append(encode_png_rgba(width, height, vals))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/png",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def encode_png_16bit(width: int, height: int, values: bytes) -> bytes:
    """Build a 16-bit grayscale (color type 0, depth 16) non-interlaced
    PNG where pixel value v carries the big-endian sample
    ((251·v+17)%256) << 8 | ((193·v+89)%256): the HIGH byte is a
    non-identity affine of v (so a decoder that skips the two-byte
    stride, averages the bytes, or reads the low byte fails the
    analytic oracle) and the LOW byte varies independently (so
    dropping it must be a deliberate high-byte narrowing, not a
    no-op)."""
    import struct
    import zlib

    if len(values) != width * height:
        raise ValueError("values must hold width*height bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 16, 0, 0, 0, 0)
    rows = bytearray()
    for y in range(height):
        rows.append(0)  # filter: None
        for v in values[y * width : (y + 1) * width]:
            rows += bytes(((251 * v + 17) % 256, (193 * v + 89) % 256))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows), 9))
        + chunk(b"IEND", b"")
    )


def as_png_16bit_media_table(
    docs: DataFrame,
    width: int = BMP_W,
    height: int = BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """16-bit twin of :func:`as_png_media_table`: the same clamped/
    zero-padded codepoints become two-byte big-endian grayscale
    samples via :func:`encode_png_16bit`, so the decoded high-byte
    luma is the closed form (251·cp+17)%256 the DuckDB oracle can
    recompute without a PNG parser."""
    n = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                vals = bytes(min(ord(c), 255) for c in t[:n]).ljust(n, b"\x00")
                payloads.append(encode_png_16bit(width, height, vals))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/png",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def as_jpeg_media_table(
    docs: DataFrame,
    width: int = 8 * BMP_W,
    height: int = 8 * BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """Baseline-JPEG twin of :func:`as_bmp_media_table`: each clamped/
    zero-padded codepoint v becomes one FLAT 8x8 block of value
    (173·v+37)%256 in a DC-only grayscale JPEG
    (:func:`~.jpeg.encode_jpeg_gray_flat`) — the constructed class
    where lossy JPEG decodes LOSSLESSLY, so the decoded statistics are
    closed-form in the codepoints and DuckDB needs no JPEG parser.
    The affine value map keeps a pass-through "decoder" from matching
    the oracle by accident."""
    from .jpeg import encode_jpeg_gray_flat

    n = (width // 8) * (height // 8)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                cps = [min(ord(c), 255) for c in t[:n]]
                cps += [0] * (n - len(cps))
                vals = bytes((173 * v + 37) % 256 for v in cps)
                payloads.append(encode_jpeg_gray_flat(width, height, vals))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/jpeg",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def as_jpeg_progressive_media_table(
    docs: DataFrame,
    width: int = 8 * BMP_W,
    height: int = 8 * BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """PROGRESSIVE twin of :func:`as_jpeg_media_table`: the same
    DC-only lossless construction (flat 8x8 blocks, all-ones
    quantization), emitted as an SOF2 stream through the default
    successive-approximation scan script — DC at Al=3, three one-bit
    DC refinements, AC band 1-63 first + refinement
    (:func:`~.jpeg.encode_jpeg_gray_flat_progressive`).  The value map
    (157·v+91)%256 differs from the baseline twin's so a decoder
    cross-wiring the two paths cannot match both oracles."""
    from .jpeg import encode_jpeg_gray_flat_progressive

    n = (width // 8) * (height // 8)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                cps = [min(ord(c), 255) for c in t[:n]]
                cps += [0] * (n - len(cps))
                vals = bytes((157 * v + 91) % 256 for v in cps)
                payloads.append(
                    encode_jpeg_gray_flat_progressive(width, height, vals)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/jpeg",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def as_jpeg_restart_media_table(
    docs: DataFrame,
    width: int = 8 * BMP_W,
    height: int = 8 * BMP_H,
    restart_interval: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """RESTART-INTERVAL twin of :func:`as_jpeg_media_table`: the same
    DC-only lossless construction carrying a DRI segment and RSTn
    markers every ``restart_interval`` MCUs — the default 5 does not
    divide the 64 blocks and forces the marker index past one
    modulo-8 cycle, so decoding must byte-align, verify the cycle, and
    reset DC predictions at every boundary.  The value map
    (149·v+53)%256 differs from both JPEG twins' so cross-wiring any
    two paths cannot match two oracles."""
    from .jpeg import encode_jpeg_gray_flat

    n = (width // 8) * (height // 8)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                cps = [min(ord(c), 255) for c in t[:n]]
                cps += [0] * (n - len(cps))
                vals = bytes((149 * v + 53) % 256 for v in cps)
                payloads.append(
                    encode_jpeg_gray_flat(
                        width, height, vals,
                        restart_interval=restart_interval,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/jpeg",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def as_png_palette_media_table(
    docs: DataFrame,
    width: int = BMP_W,
    height: int = BMP_H,
    text_col: str = "text",
) -> DataFrame:
    """:func:`as_png_media_table`'s INDEXED twin: the same clamped/
    zero-padded codepoints become palette INDICES of a color-type-3 PNG
    over the deterministic non-identity :data:`_PALETTE` — decoding
    must walk PLTE and convert each entry's RGB to luma, so the
    analytic oracle proves the indirection itself."""
    n = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                idx = bytes(min(ord(c), 255) for c in t[:n]).ljust(n, b"\x00")
                payloads.append(encode_png_palette(width, height, idx))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": payloads,
                    "media_type": "image/png",
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return _spread(docs, text_col).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


RESIZE_PX_SCHEMA = (
    "doc_id long, src_width int, src_height int, width int, height int, "
    "thumb binary, sum_thumb long, thumb_digest string"
)


def resize_pixels(
    media: DataFrame, width: int = 4, height: int = 4, pixels=bmp_pixels
) -> DataFrame:
    """REAL image resize (vs :func:`resize_media`'s byte-stride
    stand-in): decode the payload's luma plane (default: the pure-Python
    BMP parser) and nearest-neighbor resample to ``width x height`` —
    target (x, y) reads source (floor(x·sw/w), floor(y·sh/h)), the
    standard NN mapping.  Undecodable rows emit null features.  Same
    1→1 Arrow ``mapInPandas`` shape; the binary payload never shuffles —
    only thumbnails (w·h bytes) continue downstream."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sw_l, sh_l, th_l, sums, digs = [], [], [], [], []
            for b in pdf["content"]:
                parsed = pixels(bytes(b))
                if parsed is None:
                    sw_l.append(None); sh_l.append(None)
                    th_l.append(None); sums.append(None); digs.append(None)
                    continue
                sw, sh, px = parsed
                thumb = bytes(
                    px[(y * sh // height) * sw + (x * sw // width)]
                    for y in range(height)
                    for x in range(width)
                )
                sw_l.append(sw); sh_l.append(sh)
                th_l.append(thumb)
                sums.append(sum(thumb))
                digs.append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": pd.Series(sw_l, dtype="Int32"),
                    "src_height": pd.Series(sh_l, dtype="Int32"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "thumb": th_l,
                    "sum_thumb": pd.Series(sums, dtype="Int64"),
                    "thumb_digest": digs,
                }
            )

    return media.mapInPandas(op, schema=RESIZE_PX_SCHEMA)


SCANLINE_SCHEMA = (
    "doc_id long, row_idx int, scanline binary, sum_row long, "
    "row_digest string"
)


def sample_scanlines(
    media: DataFrame, every_n: int = 4, pixels=bmp_pixels
) -> DataFrame:
    """Decoded 1→N fan-out over REAL pixels (vs :func:`sample_frames`'s
    byte-frame stand-in): every ``every_n``-th ROW of the decoded luma
    plane becomes its own output row — the frame-sampling batch shape
    applied to the one decodable format this sandbox can verify.
    Undecodable payloads contribute no rows.  Sampling is scan-side;
    only the sampled scanlines (1/every_n of the pixels) move."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lines, sums, digs = [], [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["content"]):
                parsed = pixels(bytes(b))
                if parsed is None:
                    continue
                w, h, px = parsed
                for y in range(0, h, every_n):
                    row = px[y * w : (y + 1) * w]
                    ids.append(doc_id)
                    idxs.append(y)
                    lines.append(row)
                    sums.append(sum(row))
                    digs.append(hashlib.md5(row).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "row_idx": pd.Series(idxs, dtype="int32"),
                    "scanline": lines,
                    "sum_row": pd.Series(sums, dtype="int64"),
                    "row_digest": digs,
                }
            )

    return media.mapInPandas(op, schema=SCANLINE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup (aHash over the decoded payload)
# ---------------------------------------------------------------------------

AHASH_BITS = 32


def ahash_of(cps, size_col, total_col, bits: int = AHASH_BITS):
    """Blockwise average-hash signature — the aHash an image-dedup
    pipeline computes over an 8×8 grayscale thumbnail, applied to the
    deterministic decoded-payload stand-in (the payload's codepoint
    sequence; a real decoder plugs its luma sequence into the same
    column).  Bit *i* is set when block *i*'s mean exceeds the global
    mean, with the blocks the ``floor(i·L/bits)`` boundaries.

    Engine-exactness: the mean comparison is the cross-multiplied
    INTEGER inequality ``block_sum·L > total·block_len`` (no division,
    no floats), so DuckDB reproduces the signature bit-for-bit.

    ``cps``/``size_col``/``total_col`` must be already-projected columns
    (codepoint array, its size, its sum): Catalyst's CollapseProject
    keeps expensive projected arrays materialized, but inlining the fold
    here would re-evaluate it once per block.
    """
    L = size_col.cast("long")
    terms = []
    for i in range(bits):
        start = F.floor((F.lit(i) * L) / F.lit(bits)).cast("int")
        end = F.floor((F.lit(i + 1) * L) / F.lit(bits)).cast("int")
        blk = F.slice(cps, start + F.lit(1), end - start)
        bsum = F.aggregate(
            blk, F.lit(0).cast("long"), lambda a, c: a + c.cast("long")
        )
        blen = (end - start).cast("long")
        terms.append(
            F.when(
                bsum * L > total_col * blen, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    sig = terms[0]
    for t in terms[1:]:
        sig = sig + t
    return sig


def media_ahash_table(media: DataFrame, bits: int = AHASH_BITS) -> DataFrame:
    """(doc_id, ahash) over a media table: decode the binary payload
    scan-side (utf-8 stand-in for the codec) → codepoint sequence →
    blockwise aHash.  Each intermediate (codepoint array, size, sum) is
    its own projection so the O(len) folds evaluate once per row, and
    the binary payload never leaves the scan stage — only the 8-byte
    signature continues downstream."""
    from .text import char_codepoints

    t = media.select(
        "doc_id", F.decode(F.col("content"), "utf-8").alias("payload")
    )
    t = t.select("doc_id", char_codepoints(F.col("payload")).alias("cps"))
    t = t.select(
        "doc_id",
        "cps",
        F.size("cps").alias("n_cp"),
        F.aggregate(
            "cps", F.lit(0).cast("long"), lambda a, c: a + c.cast("long")
        ).alias("cp_total"),
    )
    return t.select(
        "doc_id",
        ahash_of(
            F.col("cps"), F.col("n_cp"), F.col("cp_total"), bits
        ).alias("ahash"),
    )


def _ahash_stream(texts, bits: int = AHASH_BITS):
    """Numpy aHash kernel — bit-identical to the ``ahash_of`` fold (the
    executable spec, parity-pinned in tests): codepoints via the
    utf-32-le reinterpret (no per-char python loop), block sums via one
    cumulative sum (prefix differences handle empty blocks exactly),
    bits via the same cross-multiplied integer inequality."""
    import numpy as np

    i = np.arange(bits, dtype=np.int64)
    out = []
    for s in texts:
        cps = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)
        L = cps.shape[0]
        cs = np.concatenate(([0], np.cumsum(cps)))
        starts = (i * L) // bits
        ends = ((i + 1) * L) // bits
        sums = cs[ends] - cs[starts]
        sig = np.sum(
            ((sums * L > cs[L] * (ends - starts)).astype(np.int64)) << i
        )
        out.append(int(sig))
    return out


def media_ahash_table_np(media: DataFrame, bits: int = AHASH_BITS) -> DataFrame:
    """(doc_id, ahash) via the Arrow-batched numpy kernel — the hot-path
    form of ``media_ahash_table`` (interpreted higher-order folds cost
    ~0.6 µs/element-op; the 32 slice-folds made the aHash scan the cost
    of the whole phash-dedup query).  Same signature bit-for-bit: the
    fold survives as the spec this kernel is tested against, and the
    DuckDB oracle mirrors the fold unchanged."""
    import pandas as pd  # noqa: F811 — worker-side

    def op(batches):
        for pdf in batches:
            texts = [bytes(b).decode("utf-8") for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": pd.Series(
                        _ahash_stream(texts, bits), dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(op, schema="doc_id long, ahash long")
