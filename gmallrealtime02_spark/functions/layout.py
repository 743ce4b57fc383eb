"""Write-time layout keys: the clustering step that turns footer
min/max statistics into multi-dimensional file skipping.

A single-column sort gives tight per-file stats on ONE column; a
Z-order (Morton) interleave bounds every file inside a small rectangle
of the key plane, so range predicates on EITHER dimension skip files —
Delta OPTIMIZE ZORDER / Iceberg sort-order's trick, here as a pure
Column expression computed scan-side with zero exchanges (the one
shuffle a layout job pays is its own repartitionByRange write)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Z-order key (a's bit k at position 2k, b's at 2k+1)
    — closed-form shift/mask arithmetic, no UDF, whole-stage-codegen
    friendly.  Callers scale each dimension to the [0, 2^bits) range
    first (``scale_to_bits``) so the interleave spends its bits on the
    data's actual spread.  Inputs are widened to LONG before shifting —
    an int input would wrap at bit 31 (b's bit 15 lands at position 31)
    and silently scramble the key's top of the plane."""
    a, b = a.cast("long"), b.cast("long")
    z = None
    for k in range(bits):
        term = F.shiftleft(
            F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k
        ) + F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        z = term if z is None else z + term
    return z.cast("long")


def scale_to_bits(col: Column, max_value: int, bits: int = 16) -> Column:
    """Map [0, max_value] integers onto [0, 2^bits) — the dimension
    normalization that keeps the Morton interleave meaningful when a
    column's range is far smaller than 2^bits.  floor(a*2^bits /
    (max+1)) computed via double division, exact for any realistic id
    range (numerators < 2^53); the key shapes LAYOUT only — query
    results never depend on it.  The input is widened to LONG before
    the multiply: an int32 column with values >= 2^15 would overflow
    the 32-bit product (wrapping silently in non-ANSI mode), scrambling
    the z-order and losing the tight-stats property."""
    return F.floor((col.cast("long") * (1 << bits)) / (max_value + 1)).cast(
        "int"
    )


def zorder_by(df, a_col: str, b_col: str, n_files: int, bits: int = 16):
    """Cluster ``df`` for a z-ordered write: scale both dimensions by
    their observed maxima (two 1-row aggregates), interleave, then
    range-partition + sort by the key.  Every output partition (= one
    data file under a ManifestTable append) covers a CONTIGUOUS z-range,
    i.e. a bounded rectangle union in the (a, b) plane — so per-file
    min/max on BOTH raw columns stay tight and either-dimension range
    reads skip files.  The repartitionByRange is the layout job's one
    shuffle; boundaries come from Spark's range sampler, which affects
    only file sizing, never results."""
    row = df.agg(
        F.max(a_col).alias("ma"), F.max(b_col).alias("mb")
    ).first()
    ma, mb = int(row["ma"]), int(row["mb"])
    zkey = morton_key(
        scale_to_bits(F.col(a_col), ma, bits),
        scale_to_bits(F.col(b_col), mb, bits),
        bits,
    )
    return (
        df.withColumn("_zkey", zkey)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
