"""DAU (daily-active) pipeline operators.

Reference semantics (SURVEY.md §2.3/§2.5, §3.1):
- derive ``dt``/``hr`` from epoch ts   — app/DauApp.scala:47-54  (P3)
- first-seen-wins dedup per (dt, mid)  — app/DauApp.scala:59-75  (A4,
  Redis SADD in the reference; here ROW_NUMBER()=1 batch / watermarked
  dropDuplicates streaming)
- hourly counts                        — gmall-publisher DauServicelmpl.java:45-74 (A2)
- daily total                          — DauServicelmpl.java:27-42 (A1)
- today-vs-yesterday                   — ChartController.java:48-61 (A6)

Every function is a pure DataFrame->DataFrame transform usable from both
the batch path and ``foreachBatch`` in streaming.

Scale notes:
- ``first_seen_dedup`` is ONE shuffle on the dedup key; the subsequent
  hourly aggregation re-groups by (dt, hr) which is a strict function of
  the partition key prefix ``dt`` — at 100 TB the dominant cost is the
  single wide exchange on (dt, mid), which is the minimum any
  distinct-by-key computation needs.  Map-side partial aggregation
  handles the (dt, hr) count without a second full shuffle of raw rows.
- In streaming, ``dropDuplicates`` + 48h watermark bounds state (RocksDB
  state store on a real cluster); see streaming/jobs.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_dt_hr(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive partition date ``dt`` (yyyy-MM-dd) and hour ``hr`` (HH).

    The reference string-splits a SimpleDateFormat render
    (DauApp.scala:47-54); here it's two codegen'd date functions.  ``hr``
    stays a 2-char string for parity with the serving layer's terms-agg
    key (DauServicelmpl.java:49-50).
    """
    ts = F.col(ts_col)
    return df.withColumn("dt", F.date_format(ts, "yyyy-MM-dd")).withColumn(
        "hr", F.date_format(ts, "HH")
    )


def first_seen_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Keep the first-seen row per key (deterministic tiebreak).

    Batch expression of the reference's Redis ``SADD``-guarded dedup
    (DauApp.scala:59-75, A4; DwsOrderWideApp.scala:104-122, A5):
    semantically ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order_by) = 1``.

    One hash exchange on ``keys``; rank computed within partitions.  For
    unbounded streams use ``streaming.jobs.streaming_first_seen_dedup``
    (state-store backed, watermark-bounded) instead.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dau_rows(events: DataFrame) -> DataFrame:
    """events -> deduped daily-active rows (one per dt × mid).

    The testdata ``events`` table plays the startup-log stream
    (FIXTURES.md §5): ``user_id`` is the device id ``mid``, ``ts`` the
    event time.  Output mirrors the dau_info golden schema
    (bean/DauInfo.scala:5-16) minus the constant columns.
    """
    e = with_dt_hr(events, "ts")
    deduped = first_seen_dedup(e, keys=["dt", "user_id"], order_by=["ts", "event_id"])
    return deduped.select(
        F.col("user_id").alias("mid"),
        "dt",
        "hr",
        "ts",
        "event_type",
        "value",
    )


def dau_hourly(dau: DataFrame) -> DataFrame:
    """A2: COUNT(*) GROUP BY dt, hr over deduped actives."""
    return dau.groupBy("dt", "hr").agg(F.count("*").alias("ct")).orderBy("dt", "hr")


def dau_total(dau: DataFrame) -> DataFrame:
    """A1: daily totals (the publisher's realtime-total endpoint)."""
    return dau.groupBy("dt").agg(F.count("*").alias("total")).orderBy("dt")


def dau_today_yesterday(dau: DataFrame, date: str) -> DataFrame:
    """A6: hourly counts for ``date`` and the prior day in one scan.

    The reference's publisher issues two ES queries and stitches the maps
    (ChartController.java:48-61, GetDate.java:12-24); relationally it is a
    single filtered group-by — one scan, partition-prunable on ``dt``.
    """
    yesterday = F.date_format(F.date_sub(F.to_date(F.lit(date)), 1), "yyyy-MM-dd")
    return (
        dau.filter((F.col("dt") == date) | (F.col("dt") == yesterday))
        .groupBy("dt", "hr")
        .agg(F.count("*").alias("ct"))
        .orderBy("dt", "hr")
    )
