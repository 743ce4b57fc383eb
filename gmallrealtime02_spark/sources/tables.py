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
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Footer-only metadata read: which columns are TIMESTAMP(NANOS)?

    Spark's parquet reader has no nanos timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they surface as epoch-nanos
    longs, which we convert back to microsecond timestamps (the same
    truncation DuckDB applies to these files).
    """
    import pyarrow as pa

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Plain parquet read so Catalyst keeps
    pushdown/pruning; never cache here — callers decide lifetime."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
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
