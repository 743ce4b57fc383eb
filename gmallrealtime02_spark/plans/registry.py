"""Query registry — single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (plus the north-star
LLM-pipeline operators) registers here with:

- ``fn(spark, sf_dir) -> DataFrame``  — the Spark implementation
- ``oracle``                          — equivalent ANSI SQL for DuckDB over the
  same parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings), or None for genuinely
  non-SQL-expressible ops (the driver then records a rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest oracle
suite all iterate this registry, so a query cannot pass tests while being
absent from the driver contract or vice versa.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every plan module so registrations run, then return QUERIES."""
    from . import analytics, tpch_extra, training_data, warehouse  # noqa: F401

    try:
        from . import llm_pipeline  # noqa: F401
    except ImportError:
        pass
    return QUERIES
