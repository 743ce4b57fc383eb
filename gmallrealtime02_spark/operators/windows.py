"""Analytic window functions + sessionization (SURVEY.md §2.6).

The reference has no SQL window functions — its dedup ops A4/A5 are
semantically ``ROW_NUMBER() OVER (...) = 1`` (SURVEY.md §2.6) and its only
window is the 10s/5s join-tolerance slide (W1).  The new engine exposes
the full analytic surface; these helpers cover the shapes the pipelines
use.

Scale: every window here partitions by a key (user) — one hash exchange,
then per-partition sort.  Never use a global (unpartitioned) window at
scale; it serializes onto one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_event_seq(events: DataFrame) -> DataFrame:
    """Per-user ordered event sequence: row_number, lag ts, gap seconds."""
    from ..sources.tables import ensure_parallelism

    events = ensure_parallelism(events, by=("user_id",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # exact µs arithmetic via timestamp_diff — works on both TIMESTAMP and
    # TIMESTAMP_NTZ (the testdata's naive-µs parquet reads as NTZ), unlike
    # unix_micros which rejects NTZ input
    gap = F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts"))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.row_number().over(w).alias("seq"),
        prev_ts.alias("prev_ts"),
        gap.alias("gap_us"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids: new session when the gap to the previous event
    exceeds the threshold — lag + conditional cumsum (the batch twin of
    streaming ``session_window``)."""
    from ..sources.tables import ensure_parallelism

    events = ensure_parallelism(events, by=("user_id",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return events.withColumn("session_seq", F.sum(is_new).over(w)).select(
        "event_id", "user_id", "ts", "event_type", "session_seq"
    )


def running_total(events: DataFrame) -> DataFrame:
    """Running per-user sum of ``value`` (frame: unbounded preceding→current).

    Decimal accumulation keeps the prefix sums exact, so results are
    engine- and partitioning-independent."""
    from ..sources.tables import ensure_parallelism

    events = ensure_parallelism(events, by=("user_id",))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
    )


def asof_prev_event(
    events: DataFrame, target_type: str, source_type: str
) -> DataFrame:
    """As-of join without a range join: for each ``target_type`` event, the
    most recent ``source_type`` event timestamp by the same user at-or-before
    it (``target.ts >= source.ts``).

    Expressed as union + carry-forward: tag both event kinds, sort within
    user (sources first on timestamp ties), and carry the last source ts
    forward with ``last(..., ignorenulls)``.  One hash exchange on user_id
    and a per-partition sort -- no O(n*m) range-join blowup, which is what
    makes this shape survive 100 TB where a theta join would not.

    The (ts, kind_ord, event_id) source-first tie rule defined here is
    REPLICATED (with richer carried payloads) by
    ``plans.warehouse.scd2_pit_join``,
    ``plans.behavior.attribution_last_touch``, their oracle SQL, and the
    Python port in ``streaming.jobs.streaming_attribution`` — change the
    rule in all of them together or batch/PIT/streaming results diverge.
    """
    sub = events.filter(F.col("event_type").isin([target_type, source_type]))
    marked = sub.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == source_type, F.col("ts")).alias("src_ts"),
        F.when(F.col("event_type") == source_type, 0).otherwise(1).alias("kind_ord"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind_ord", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = marked.withColumn(
        "prev_src_ts", F.last("src_ts", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("event_type") == target_type).select(
        "event_id", "user_id", "ts", "prev_src_ts"
    )


def scd2_of(events: DataFrame) -> DataFrame:
    """SCD type-2 history from a change stream (user_id, event_id, ts,
    event_type): consecutive repeats collapse, intervals close at the
    next change, the open row is current.  ONE exchange: lag/filter/
    lead/row_number share the (user_id) partitioning and (ts, event_id)
    sort.  ``event_id`` rides along as the change row's provenance (and
    the streaming job's replay tiebreak); relational consumers drop it."""
    from ..sources.tables import ensure_parallelism

    events = ensure_parallelism(events, by=("user_id",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = events.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNull() | (F.col("event_type") != F.col("prev"))
    )
    return chg.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )
