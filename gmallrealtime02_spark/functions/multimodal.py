"""Multimodal (image/audio/video) column plumbing (north-star ops).

Media is modeled as opaque ``binary`` content columns + a typed metadata
struct.  The Spark-side machinery — schema, partition-preserving
``mapInPandas`` with Arrow batches, deterministic feature extraction — is
real and tested; the actual codec step is STUBBED (image/audio libraries
are not available in this environment) behind ``decode_media``, which
raises ``NotImplementedError`` unless a decoder is importable.

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
    "n_pixels long, mean_luma double, pixel_digest string"
)


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
    when Pillow is importable; otherwise raises ``NotImplementedError``
    (this environment ships no codec library — the decoder slot, batch
    shape, and schema are real and tested via an injected decoder)."""
    if decoder is None:
        try:
            import PIL  # noqa: F401

            decoder = pillow_decoder
        except ImportError as exc:
            raise NotImplementedError(
                "media decode requires an image/audio codec library (e.g. "
                "Pillow); none is available in this environment — pass "
                "decoder= explicitly to use a custom codec"
            ) from exc

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        null_row = {
            "width": None,
            "height": None,
            "mode": None,
            "n_pixels": None,
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
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.mapInPandas(op, schema=DECODED_SCHEMA)


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
