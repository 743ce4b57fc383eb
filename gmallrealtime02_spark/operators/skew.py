"""Skew-mitigation strategies for hot keys at scale.

AQE's skew-join splitting (on in session.py) handles most join skew at
runtime, and partial (map-side) aggregation absorbs most group-by skew.
The two cases that still need an explicit strategy at 100 TB:

- **Skewed join keys where AQE can't act** (e.g. the skewed side feeds a
  co-partitioned window, or AQE is off): ``salted_join`` replicates the
  small side per salt so one hot key spreads over ``n_salts`` tasks.
- **Exact distinct-count with hot group keys**: a single reducer owns all
  distinct values of a hot key.  ``salted_distinct_count`` shards each
  key's value-space by ``hash(value) % n_salts`` — duplicates of the same
  (key, value) still collide (correctness), but a hot key's state is
  spread over n_salts tasks; a second tiny aggregation sums the shard
  counts.

Both are pure DataFrame rewrites with bit-identical results to their
unsalted forms (asserted in tests/test_scale_strategies.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated ``n_salts``× and the fact
    side salted round-robin by a deterministic row hash — a hot fact key
    lands on n_salts tasks instead of one.

    Use when one fact key dominates (power-law ids) and the other side is
    small enough to replicate but too big to broadcast outright.

    Only join types whose output is driven by the FACT side are
    equivalent to the unsalted join: ``inner``, ``left``, ``left_semi``
    and ``left_anti`` (a fact row's salt matches exactly one dim
    replica, so semi/anti membership is unchanged and replicas can never
    duplicate fact output).  Any type that emits UNMATCHED dim rows
    (right/full/right_semi/...) would emit each of them n_salts times —
    rejected loudly rather than silently wrong.  ``how`` is matched
    case-insensitively with underscores ignored, the same normalization
    Spark's own ``DataFrame.join`` applies.
    """
    how_norm = how.strip().lower().replace("_", "")
    if how_norm not in ("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti only "
            f"(got {how!r}): the replicated dim side would duplicate "
            "unmatched rows n_salts times under right/full semantics"
        )
    fact_s = fact.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts)),
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["__salt"] == dim_s["__salt"]),
        how,
    )
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """COUNT(DISTINCT value) per key, skew-proof.

    Stage 1 groups by (keys, hash(value) % n_salts) and counts distinct
    values inside each shard — same (key, value) always hashes to the
    same shard, so shards partition the value space exactly.  Stage 2
    sums the shard counts per key (n_salts rows per key — trivial).
    Output column: ``uniques``.
    """
    shard = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts)).alias("__shard")
    stage1 = df.groupBy(*keys, shard).agg(
        F.countDistinct(value_col).alias("__part_uniques")
    )
    return stage1.groupBy(*keys).agg(F.sum("__part_uniques").alias("uniques"))
