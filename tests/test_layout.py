"""Morton/Z-order layout helpers: key bijectivity, locality, and the
zorder_by write shape that manifest_zorder_prune relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallrealtime02_spark.functions.layout import (
    morton_key,
    scale_to_bits,
    zorder_by,
)


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for k in range(bits):
        z |= ((a >> k) & 1) << (2 * k)
        z |= ((b >> k) & 1) << (2 * k + 1)
    return z


def test_morton_key_matches_reference_bit_interleave(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1024, 65535)],
        "a int, b int",
    )
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", morton_key(F.col("a"), F.col("b"))).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton(a, b), (a, b)


def test_morton_key_is_injective_on_grid(spark):
    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("a"),
        (F.col("id") / n).cast("int").alias("b"),
    )
    assert (
        df.select(morton_key(F.col("a"), F.col("b")).alias("z"))
        .distinct()
        .count()
        == n * n
    )


def test_scale_to_bits_bounds(spark):
    df = spark.createDataFrame([(0,), (499,), (999,)], "v long")
    vals = [
        r.s for r in df.select(scale_to_bits(F.col("v"), 999, 16).alias("s")).collect()
    ]
    assert vals[0] == 0 and vals[-1] < (1 << 16)
    assert vals == sorted(vals)  # monotone


def test_zorder_by_partitions_are_z_contiguous(spark, sf_dir):
    from gmallrealtime02_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.timestamp_diff(
            "HOUR",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col("ts"),
        ).alias("hour_idx"),
    )
    out = zorder_by(ev, "user_id", "hour_idx", n_files=8)
    # rows survive exactly (layout is a permutation, never a filter)
    assert out.count() == ev.count()
    assert "_zkey" not in out.columns
    # each partition covers a z-range disjoint from every other's: the
    # per-partition [min,max] intervals must not overlap
    row = ev.agg(F.max("user_id"), F.max("hour_idx")).first()
    mu, mh = int(row[0]), int(row[1])
    from gmallrealtime02_spark.functions.layout import morton_key as mk

    keyed = zorder_by(ev, "user_id", "hour_idx", n_files=8).withColumn(
        "z",
        mk(
            scale_to_bits(F.col("user_id"), mu),
            scale_to_bits(F.col("hour_idx"), mh),
        ),
    )
    spans = (
        keyed.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted([(r.lo, r.hi) for r in spans])
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans  # contiguous, non-overlapping ranges


def test_scale_to_bits_int32_no_overflow(spark):
    """An IntegerType column with values >= 2^15 must scale without the
    32-bit multiply wrapping (col * 2^16 overflows int32 at 2^15 —
    silently scrambling the z-order in non-ANSI mode, erroring under
    ANSI): the input is widened to long first, so the mapping stays
    monotone over the full int32 range."""
    vals = [0, 1 << 15, (1 << 20) + 7, (1 << 31) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = [
        r.s
        for r in df.select(
            scale_to_bits(F.col("v"), (1 << 31) - 1, 16).alias("s")
        ).collect()
    ]
    assert got == sorted(got)  # monotone, no wrap to negatives
    assert got[0] == 0 and all(0 <= s < (1 << 16) for s in got)
    assert got[-1] == (1 << 16) - 1
