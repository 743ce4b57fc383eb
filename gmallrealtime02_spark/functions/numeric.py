"""Cross-engine EXACT rounding for ratio-valued output columns.

Why this exists: ``round(x, 6)`` on a DOUBLE is resolved DIFFERENTLY by
engines at decimal midpoints.  Spark's ``F.round`` goes through
``BigDecimal.valueOf(double)`` — HALF_UP on the double's SHORTEST DECIMAL
REPR — while DuckDB rounds the BINARY value (which for a non-representable
decimal like 0.0005005 sits a hair BELOW the midpoint, rounding DOWN).
Any output of the form ``round(exact_integer_ratio, 6)`` therefore differs
by exactly 1e-6 whenever the true ratio lands on the 5e-7 grid.  This is
invisible at small scale and emerges with data volume: the sf0.1 oracle
sweep caught a 128-trigram document in ``char_ngram_entropy`` (n a power
of two ⇒ the trigram-entropy quotient hits exact midpoints), three
fully-overlapping source pairs in ``source_jsd_matrix`` (jsd = kl/2 with
kl an exact odd-last-digit decimal), and ``hashed_ngram_score``'s integer
weight ratios — all engine-flipped midpoints, none wrong answers.

The fix: perform the rounding in EXACT INTEGER space — half away from
zero, the same convention Spark's HALF_UP resolves to for both signs —
identically on both engines, and divide by 1e6 only at the very end (the
final division of the same exact integer by the same power of ten is a
single correctly-rounded IEEE op on every engine, so the emitted doubles
are bit-identical).

    micro = sign(num) * ((2*|num|*scale + den) intdiv (2*den)),   den > 0

Use :func:`ratio_micro` (Spark Column) with :func:`ratio_micro_sql`
(DuckDB oracle snippet) as a pair, then ``micro/1e6`` on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000


_DEC = "decimal(38,0)"


def _intdiv_pos(num: Column, den: Column) -> Column:
    """Exact integer division of non-negative integer-valued DECIMAL
    columns.  ``num - num % den`` is an exact multiple of ``den``
    (decimal remainder is exact), and decimal division of an exact
    multiple yields the exact integer quotient at any scale — unlike a
    double division, which silently rounds once operands pass 2^53 (a
    bug the fuzz parity test caught at |num| ~ 1e12)."""
    return ((num - num % den) / den).cast("long")


def ratio_micro(num: Column, den: Column, scale: int = MICRO) -> Column:
    """``round_half_away(num/den * scale)`` as an exact LONG — num/den
    integer-valued LONG or DECIMAL columns, den > 0.  With the default
    scale this is the micro-unit integer of ``round(num/den, 6)``; the
    caller emits ``ratio_micro(...).cast("double") / 1e6`` and the
    oracle emits the twin :func:`ratio_micro_sql` — bit-identical
    doubles, no engine midpoint resolution in the path.

    All arithmetic runs in DECIMAL(38,0) (exact to 38 digits), so the
    magnitude bound is ``2*|num|*scale + den < 10^38`` — far past any
    call site (the earlier int64/double formulation went inexact at
    ``2*|num|*scale > 2^53``)."""
    n0 = F.abs(num).cast(_DEC)
    d0 = den.cast(_DEC)
    nummag = n0 * F.lit(scale).cast(_DEC) * F.lit(2).cast(_DEC) + d0
    mag = _intdiv_pos(nummag, d0 * F.lit(2).cast(_DEC))
    return F.when(num < 0, -mag).otherwise(mag)


def ratio_micro_sql(num: str, den: str, scale: int = MICRO) -> str:
    """DuckDB twin of :func:`ratio_micro` — ``num``/``den`` are integral
    SQL expressions, den > 0.  ``//`` is DuckDB integer floor division;
    the dividend is non-negative so floor == truncate == the Spark
    helper.  HUGEINT (int128) gives the oracle far more headroom than
    the Spark side's int64/decimal bound, so the oracle never overflows
    first."""
    return (
        f"(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END) * "
        f"CAST((2 * CAST(abs({num}) AS HUGEINT) * {scale} + ({den})) "
        f"// (2 * CAST(({den}) AS HUGEINT)) AS BIGINT)"
    )


def py_ratio_micro(num: int, den: int, scale: int = MICRO) -> int:
    """Python twin for Arrow kernels (exact int arithmetic, den > 0)."""
    mag = (2 * abs(num) * scale + den) // (2 * den)
    return -mag if num < 0 else mag


def ratio_micro_spark_sql(num: str, den: str, scale: int = MICRO) -> str:
    """Spark-SQL TEXT twin of :func:`ratio_micro` for queries written
    through the ``spark.sql`` surface — ``num``/``den`` integral SQL
    expressions, den > 0.  Spark's ``div`` truncates toward zero (DuckDB
    ``//`` floors), so like the Column form the division runs on the
    NON-NEGATIVE magnitude where the two agree; all arithmetic in
    DECIMAL(38,0).  Parity with the other three forms is pinned in
    tests/test_numeric.py."""
    n0 = f"CAST(abs({num}) AS DECIMAL(38,0))"
    d0 = f"CAST(({den}) AS DECIMAL(38,0))"
    return (
        f"(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END) * "
        f"CAST((2 * {n0} * {scale} + {d0}) div (2 * {d0}) AS BIGINT)"
    )
