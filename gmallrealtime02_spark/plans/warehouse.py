"""Warehouse-parity queries: the reference's operator inventory over the
driver testdata (mapping per FIXTURES.md §5).

Phase 0 slice: the DAU pipeline (SURVEY.md §3.1) — the reference's
signature query — parse → derive dt/hr → first-seen dedup → hourly agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dau as dau_ops
from ..sources import load_table
from .registry import register

# Deduped daily-active rows as a reusable building block.


def _dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dau_ops.dau_rows(load_table(spark, sf_dir, "events"))


_DAU_ORACLE_CTE = """
WITH dau AS (
    SELECT mid, dt, hr, ts, event_type, value
    FROM (
        SELECT user_id AS mid,
               strftime(ts, '%Y-%m-%d') AS dt,
               strftime(ts, '%H') AS hr,
               ts, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY strftime(ts, '%Y-%m-%d'), user_id
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1
)
"""


@register(
    "dau_mids",
    oracle=_DAU_ORACLE_CTE + "SELECT mid, dt, hr, ts, event_type, value FROM dau",
    tags=("A4", "P3", "dedup"),
)
def dau_mids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen row per (dt, mid) — reference DauApp.scala:59-75 (A4)."""
    return _dau(spark, sf_dir)


@register(
    "dau_hourly",
    oracle=_DAU_ORACLE_CTE + "SELECT dt, hr, count(*) AS ct FROM dau GROUP BY dt, hr",
    tags=("A2",),
)
def dau_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly active counts — publisher DauServicelmpl.java:45-74 (A2)."""
    return dau_ops.dau_hourly(_dau(spark, sf_dir))


@register(
    "dau_total",
    oracle=_DAU_ORACLE_CTE + "SELECT dt, count(*) AS total FROM dau GROUP BY dt",
    tags=("A1",),
)
def dau_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals — publisher DauServicelmpl.java:27-42 (A1)."""
    return dau_ops.dau_total(_dau(spark, sf_dir))


_COMPARE_DATE = "2024-01-02"


@register(
    "dau_today_yesterday",
    oracle=_DAU_ORACLE_CTE
    + f"""
    SELECT dt, hr, count(*) AS ct FROM dau
    WHERE dt IN ('{_COMPARE_DATE}',
                 strftime(DATE '{_COMPARE_DATE}' - INTERVAL 1 DAY, '%Y-%m-%d'))
    GROUP BY dt, hr
    """,
    tags=("A6",),
)
def dau_today_yesterday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Today-vs-yesterday hourly — ChartController.java:48-61 (A6)."""
    return dau_ops.dau_today_yesterday(_dau(spark, sf_dir), _COMPARE_DATE)
