"""Batch source builders over the driver's parquet testdata.

The reference's sources are Kafka topics with manual Redis offset
bookkeeping (util/MyKafkaUtil.scala:17-55, util/OffsetManager.scala:14-46).
In this engine the batch path reads parquet directly (columnar scan with
predicate pushdown + column pruning); the streaming path
(gmallrealtime02_spark.streaming) uses Structured Streaming sources with
checkpointing, which replaces the offset bookkeeping wholesale.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=None)
def _ts_column_kinds(path: str) -> tuple[tuple[str, str], ...]:
    """Footer-only metadata read: classify each timestamp column.

    Returns ``(name, kind)`` pairs where kind is:

    - ``"nanos"`` — TIMESTAMP(NANOS).  Spark's parquet reader has no nanos
      type; with ``spark.sql.legacy.parquet.nanosAsLong`` they surface as
      epoch-nanos longs, which we convert back to microsecond timestamps
      (the same truncation DuckDB applies).
    - ``"ntz"`` — µs/ms timestamps with ``isAdjustedToUTC=false``, which
      Spark 4 reads as TIMESTAMP_NTZ.  Literals compared against these
      MUST be cast to ``timestamp_ntz``: an LTZ literal gets coerced
      through the *session timezone*, silently shifting the bound on a
      non-UTC host.
    - ``"ltz"`` — tz-adjusted timestamps (ordinary TIMESTAMP).
    """
    import pyarrow as pa

    schema = pq.read_schema(path)
    out = []
    for f in schema:
        if not pa.types.is_timestamp(f.type):
            continue
        if f.type.unit == "ns":
            out.append((f.name, "nanos"))
        elif f.type.tz is None:
            out.append((f.name, "ntz"))
        else:
            out.append((f.name, "ltz"))
    return tuple(out)


def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    return tuple(n for n, k in _ts_column_kinds(path) if k == "nanos")


def _iso_to_nanos(iso: str) -> int:
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)  # testdata timestamps are UTC-naive
    return int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1_000


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_bounds: dict[str, tuple[str | None, str | None]] | None = None,
) -> DataFrame:
    """Scan one testdata table. Plain parquet read so Catalyst keeps
    pushdown/pruning; never cache here — callers decide lifetime.

    ``ts_bounds`` maps a timestamp column to an inclusive ``(lo_iso,
    hi_iso)`` range applied BEFORE the nanos→µs conversion Project.  For
    TIMESTAMP(NANOS) columns (which Spark surfaces as epoch-nanos longs)
    a filter written after the conversion sits above a Project on a
    computed expression, so it can never become a parquet pushed filter —
    no row-group statistics skipping, which at 100 TB means scanning
    every file of a date-sorted fact table.  The raw-long comparison
    pushes (`PushedFilters: [LessThanOrEqual(ts, ...)]`), pinned by
    tests/test_plan_shapes.py.  Semantics match a filter on the
    µs-truncated value exactly: lo is whole-µs so `trunc(raw) >= lo ⇔
    raw >= lo`; hi uses `raw <= hi + 999 ns ⇔ trunc(raw) <= hi`.
    Native-unit timestamp columns take the ordinary pushable filter.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    kinds = dict(_ts_column_kinds(path))
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        # Self-sufficient on ANY SparkSession: the driver's harness builds
        # its own vanilla session, which otherwise dies with
        # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) columns.  Both confs are
        # runtime-settable.  UTC pins dt/hr derivations to the oracle's
        # timezone on a non-UTC host.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c, (lo, hi) in (ts_bounds or {}).items():
        kind = kinds.get(c)
        if kind == "nanos":
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(_iso_to_nanos(lo)))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(_iso_to_nanos(hi) + 999))
        else:
            # NTZ literals parse the ISO string tz-independently; an LTZ
            # cast would route the comparison through the session timezone.
            lit_type = "timestamp_ntz" if kind == "ntz" else "timestamp"
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo).cast(lit_type))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi).cast(lit_type))
    for c in nanos_cols:
        # integer `div`, not `/1000` — the float path loses sub-µs bits on
        # epoch-nanos magnitudes and can flip a microsecond vs the oracle
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def ensure_parallelism(df: DataFrame, by: tuple[str, ...] | None = None) -> DataFrame:
    """Spread a narrow scan across all cores before heavy per-row work.

    The testdata parquet files are single-row-group, so a scan arrives as
    ONE split and everything before the first exchange runs on one task.
    Conditional: only repartitions when the scan has fewer partitions than
    ``defaultParallelism`` — at 100 TB scans have thousands of splits and
    this is a no-op.  When ``by`` is given, hash-partitions on those
    columns so a downstream aggregation/join keyed on them (or their
    aliases — Spark's alias-aware output partitioning) needs no second
    exchange."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if by:
        return df.repartition(*[F.col(c) for c in by])
    return df.repartition(target)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
