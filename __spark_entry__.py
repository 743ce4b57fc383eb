"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``gmallrealtime02_spark.plans`` — the query registry is the
single source of truth; tests and this contract iterate the same dict.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmallrealtime02_spark.plans.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the DAU hourly pipeline (parse → derive → first-seen
    dedup → agg), the reference's signature dataflow (SURVEY.md §3.1), on
    /root/testdata/sf0.001."""
    q = load_all()["dau_hourly"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
