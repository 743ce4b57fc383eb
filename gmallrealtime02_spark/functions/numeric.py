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


def _intdiv_pos(num: Column, den: Column) -> Column:
    """Exact integer division of non-negative LONG columns.  ``num - num
    % den`` is an exact multiple of ``den``; dividing two exact doubles
    whose true quotient is an integer < 2^53 is correctly rounded, hence
    exact — no floor-of-float boundary hazard."""
    return ((num - num % den) / den).cast("long")


def ratio_micro(num: Column, den: Column, scale: int = MICRO) -> Column:
    """``round_half_away(num/den * scale)`` as an exact LONG — num/den
    LONG columns, den > 0.  With the default scale this is the micro-unit
    integer of ``round(num/den, 6)``; the caller emits
    ``ratio_micro(...).cast("double") / 1e6`` and the oracle emits the
    twin :func:`ratio_micro_sql` — bit-identical doubles, no engine
    midpoint resolution in the path.

    Magnitude guard: ``2*|num|*scale`` must stay below 2^63; every
    call-site ratio here is bounded (weight sums ≤ 1e9·scale, entropy
    micro-sums ≤ 1e11·scale-at-1)."""
    nummag = F.abs(num) * F.lit(scale).cast("long") * 2 + den
    mag = _intdiv_pos(nummag, den * 2)
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
