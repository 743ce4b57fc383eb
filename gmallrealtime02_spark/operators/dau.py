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
- In streaming, ``dropDuplicatesWithinWatermark`` (48h delay) both
  dedups exactly for the day-scoped key and lets the watermark evict
  state (RocksDB state store on a real cluster); see streaming/jobs.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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

    Physical strategy: ``min(struct(order_by..., rest...))`` hash
    aggregation, not a ranking window — partial (map-side) aggregation
    collapses duplicates before the exchange and no per-partition sort is
    needed, which is exactly what survives a 100 TB dedup (the window
    form shuffles every duplicate and sorts each partition).  The struct
    comparison is lexicographic, so this both matches ROW_NUMBER()=1
    whenever ``order_by`` is unique per key and stays fully deterministic
    on ties (the window form's tie-pick is partitioning-dependent).  For
    unbounded streams use ``streaming.jobs.streaming_first_seen_dedup``
    (state-store backed, watermark-bounded) instead.
    """
    cols = df.columns
    packed_cols = list(order_by) + [c for c in cols if c not in keys and c not in order_by]
    agg = df.groupBy(*keys).agg(
        F.min(F.struct(*[F.col(c) for c in packed_cols])).alias("__first")
    )
    return agg.select(
        *[F.col(k) for k in keys],
        *[F.col(f"__first.{c}").alias(c) for c in packed_cols],
    ).select(*cols)


# The event columns a dau row carries (everything dau_rows' output needs;
# the pre-shuffle projection and the final select both derive from this
# one list so they cannot drift apart — adding a column to the output
# means adding it here, once).
DAU_EVENT_COLS = ("event_id", "ts", "user_id", "event_type", "value")


def dau_rows(events: DataFrame) -> DataFrame:
    """events -> deduped daily-active rows (one per dt × mid).

    The testdata ``events`` table plays the startup-log stream
    (FIXTURES.md §5): ``user_id`` is the device id ``mid``, ``ts`` the
    event time.  Output mirrors the dau_info golden schema
    (bean/DauInfo.scala:5-16) minus the constant columns.
    """
    from ..sources.tables import ensure_parallelism

    # project to the columns the dau row actually carries BEFORE the
    # exchange: first_seen_dedup packs every non-key column into its
    # min(struct(...)), so Catalyst cannot prune what the output drops —
    # without this the events ``props`` JSON blob (the widest column)
    # rode the shuffle and the aggregate only to be discarded
    # (guide §2.3: project before the exchange; also narrows ReadSchema
    # at the parquet scan).  Dropping it cannot change the winner:
    # (ts, event_id) is unique per key, so the struct min is decided
    # before any payload column is compared.
    needed = events.select(*DAU_EVENT_COLS)
    # pre-cluster by user_id: satisfies the dedup's ClusteredDistribution
    # on (dt, user_id) — subset rule — so no second exchange, and the
    # derive + partial agg run on all cores even from a one-split scan
    e = with_dt_hr(ensure_parallelism(needed, by=("user_id",)), "ts")
    deduped = first_seen_dedup(e, keys=["dt", "user_id"], order_by=["ts", "event_id"])
    return deduped.select(
        F.col("user_id").alias("mid"),
        "dt",
        "hr",
        "ts",
        "event_type",
        "value",
    )


def dau_first_ts(events: DataFrame) -> DataFrame:
    """(mid, dt, hr, ts) of the first-seen row per (dt, mid) — the
    count-only core of the DAU family (``dau_hourly`` / ``dau_total`` /
    ``dau_today_yesterday`` read nothing but dt/hr from the dedup winner).

    Equivalence to ``dau_rows``: the first-seen winner under
    order_by=(ts, event_id) carries ts = min(ts) over its (dt, mid)
    group — the struct-min is lexicographic with ts leading, and the
    event_id tiebreak only chooses among rows sharing that same minimal
    ts — so the winner's dt/hr/ts are pure functions of min(ts).
    min(ts) has a PRIMITIVE (mutable) aggregation buffer, so the plan
    replaces the struct-min's per-partition Sort + SortAggregate pair
    with a partial-aggregating HashAggregate (map-side collapse before
    the exchange), and the scan's ReadSchema narrows to (ts, user_id) —
    at 100 TB the dedup exchange carries 16-byte partials instead of
    full event rows (guide §1.2 algorithm choice, §2.3 shuffle fewer
    bytes).  Payload consumers (``dau_mids``) stay on ``dau_rows``'
    struct-min, which is the general form.
    """
    from ..sources.tables import ensure_parallelism

    e = ensure_parallelism(events.select("ts", "user_id"), by=("user_id",))
    agg = (
        e.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt", "user_id")
        .agg(F.min("ts").alias("ts"))
    )
    return agg.select(
        F.col("user_id").alias("mid"),
        "dt",
        F.date_format("ts", "HH").alias("hr"),
        "ts",
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
