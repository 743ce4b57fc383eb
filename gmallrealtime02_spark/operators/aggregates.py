"""Aggregation operators (SURVEY.md §2.5, §2.7).

The reference pushes all true aggregation to Elasticsearch (match_all
counts, terms aggs — DauServicelmpl.java:27-74, MyEsUtil.scala:25); here
they are native hash aggregations with map-side partial aggregation.

Float discipline for oracle hash-exactness: money/metric sums accumulate
as DECIMAL (associative+commutative ⇒ order-independent across any
partitioning) and convert to double only at the end; averages divide the
exact decimal sum by the count in double and round.  This is also the
right call at 100 TB — decimal partial aggs cost little and make results
partitioning-invariant, so a re-run on a different cluster layout hashes
identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dsum(col: str | Column, scale: int = 6) -> Column:
    """Order-independent sum of a double column: cast each value to
    decimal first (exact per-row, engine-independent for scale ≤ 6 since
    decimal halfway points are not binary-representable), sum exactly,
    return double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 6, round_to: int = 6) -> Column:
    """Deterministic average: exact decimal sum, then the final rounding
    in EXACT integer units (functions.numeric half-away) — the
    decimal-sum/count ratio is exact, so ``F.round(double, 6)`` would
    resolve decimal midpoints engine-dependently (shortest-repr HALF_UP
    vs binary) at data scale."""
    from ..functions.numeric import ratio_micro

    c = F.col(col) if isinstance(col, str) else col
    mul = 10**scale
    unit = 10**round_to
    s = F.sum(c.cast(f"decimal(18,{scale})"))
    micro = ratio_micro(s * mul, F.count(c) * mul, scale=unit)
    return micro.cast("double") / float(unit)


def group_avg_ordered(events: DataFrame) -> DataFrame:
    """A3: GROUP BY + AVG + ORDER BY the aggregate (the ES DSL demo at
    MyEsUtil.scala:25: terms on name ordered by avg sub-agg)."""
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("ct"), davg("value").alias("avg_value"))
        .orderBy("avg_value")
    )


def top_k_global(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k: TakeOrderedAndProject physical op — no full sort, each
    partition keeps k rows, driver merges k·p rows.  The reference's
    serving-layer size caps (DauServicelmpl.java:49)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, keys: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k per group via ranked window — single shuffle on the group key."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )
