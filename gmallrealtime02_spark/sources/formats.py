"""Non-parquet batch sources: CSV, JSON-lines, and ORC readers with
explicit schema enforcement.

The reference ingests JSON strings from Kafka and parses them in app
code (app/DauApp.scala:44-46 `JSON.parseObject`, ods/OdsGmallCanal.scala
envelope handling); the engine's equivalent batch surface is a
schema-first reader per format.  Schemas are always EXPLICIT — schema
inference reads the data twice and derives a different schema per
sample, which at 100 TB is both a second full scan and a
schema-drift hazard.  Malformed-record policy is the standard Spark
trichotomy, surfaced as an argument:

- ``FAILFAST``  — abort the job on the first malformed record (the
  right default for curated warehouse loads);
- ``PERMISSIVE`` — null out unparsable fields and capture the raw line
  in ``_corrupt_record`` for quarantine (the right default for raw web
  ingest — the corrupt rows become a filterable side-channel);
- ``DROPMALFORMED`` — silently drop (use only when a drop rate is
  separately monitored).

Scale notes: CSV/JSON are row formats — no column pruning, no
predicate pushdown, no row-group skipping; every byte is read and
parsed.  They are INGEST formats here: land them once, convert to
parquet (``to_parquet``), and run queries against the columnar copy.
ORC is columnar and keeps pushdown/pruning like parquet.  All three
readers split large files across tasks (CSV/JSON by line boundaries),
so ingest parallelism follows file size, not file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    """PERMISSIVE capture requires the corrupt column to exist in the
    schema; add it when absent."""
    from pyspark.sql.types import StringType

    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    mode: str = "FAILFAST",
    timestamp_format: str | None = None,
) -> DataFrame:
    """Schema-enforced CSV scan.  Timestamp format is left at Spark's
    default (ISO-8601 with optional fraction) so reads round-trip
    Spark's own CSV writes; pass ``timestamp_format`` only for foreign
    files.  NTZ fields in the schema parse tz-independently."""
    if mode == "PERMISSIVE":
        schema = _with_corrupt_field(schema)
    r = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format is not None:
        r = r.option("timestampFormat", timestamp_format).option(
            "timestampNTZFormat", timestamp_format
        )
    return r.csv(path)


MICRO_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
"""Microsecond render for CSV/JSON timestamp columns.  Spark's writer
default is millisecond (`.SSS`) — LOSSY for µs data; pass this to BOTH
the writer (`timestampNTZFormat`/`timestampFormat` option) and these
readers when timestamps must round-trip exactly."""


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    timestamp_format: str | None = None,
) -> DataFrame:
    """Schema-enforced JSON-lines scan (one object per line — the shape
    Kafka/CDC envelopes and web-crawl WARC sidecars arrive in).  In
    PERMISSIVE mode unparsable lines surface whole in
    ``_corrupt_record`` with every typed field null — filter on it to
    split clean rows from the quarantine stream."""
    if mode == "PERMISSIVE":
        schema = _with_corrupt_field(schema)
    r = (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format is not None:
        r = r.option("timestampFormat", timestamp_format).option(
            "timestampNTZFormat", timestamp_format
        )
    return r.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet (pushdown, pruning, stripe-level
    skipping all apply), so no schema argument is needed: ORC files are
    self-describing and Spark reads the embedded schema."""
    return spark.read.orc(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantine): quarantine rows
    carry the raw malformed line; clean rows drop the capture column.

    The input is cached first — Spark disallows queries that reference
    ONLY the internal corrupt-record column of a raw CSV/JSON scan
    (SPARK-21610: the parser would have to re-read just to re-fail);
    one ingest-time materialization also means the raw files are parsed
    once, not once per consumer."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def to_parquet(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """Land an ingest-format scan as the columnar copy queries run on.
    One pass; partition columns become directory pruning keys."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
