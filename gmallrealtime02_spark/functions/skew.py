"""Skew mitigation for hot join keys.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on by
default in this engine's sessions) handles most skew at runtime by
splitting oversized partitions — prefer it.  Manual salting remains the
right tool where AQE cannot act: stream-static joins inside
foreachBatch (no AQE re-plan mid-stream), deterministic-layout
requirements, or aggregation pipelines where ONE key dominates so hard
that even a split partition's single key exceeds executor memory.

``salted_join`` implements the classic rewrite: the skewed (big) side
tags each row with ``salt = hash(row) % n``; the other side replicates
every row ``n`` times, once per salt value; the join key becomes
(key, salt), spreading each hot key over ``n`` reducers.  Semantics are
exactly those of the plain inner equi-join (pinned by test); cost is an
n-fold blowup of the SMALLER side, so pick n ~ (hot-key rows /
target-partition-rows), not larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salt: int = 8,
    salt_by: str | None = None,
) -> DataFrame:
    """Inner equi-join with the hot-key load spread over ``n_salt``
    reducers.

    ``salt_by``: column of the skewed side whose hash spreads rows
    across salts (defaults to a positionally-stable hash of all columns
    via ``xxhash64``; pass an id column for a deterministic layout).
    The salt NEVER leaks into the result schema."""
    salt_src = (
        F.xxhash64(salt_by) if salt_by is not None else F.xxhash64(*skewed.columns)
    )
    s = skewed.withColumn("__salt", F.pmod(salt_src, F.lit(n_salt)))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return s.join(o, [on, "__salt"]).drop("__salt")
