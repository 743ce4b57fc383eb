"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (all rows computed,
no collect/IO skew).  The headline set spans every subsystem: dedup+agg
(DAU), fact⋈fact shuffle join (order_wide), broadcast snowflake
(detail_snowflake), wide hash agg (pricing_summary), star join+agg
(revenue_by_nation), window (sessionize), minhash+LSH dedup, brute-force
ANN, and the text-feature scan (doc_quality).
"""

from __future__ import annotations

import json
import os
import re
import time

from gmallrealtime02_spark.plans.registry import load_all
from gmallrealtime02_spark.session import get_spark

HEADLINE = [
    "dau_hourly",
    "order_wide",
    "detail_snowflake",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "sessionize",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "doc_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="bench")

    queries = load_all()
    # Warmup pass (untimed): drives JIT/codegen + file-index caches the way
    # any steady-state service would be warmed; the timed pass then measures
    # execution, not first-call JVM compilation.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in HEADLINE:
        queries[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        # Bound peak memory to one query's caches: a query's own persists
        # re-fill on its first timed run (so best-of-2 still measures the
        # warm plan), but nothing accumulates across the sweep.
        spark.catalog.clearCache()

    # Best-of-2 per query: local-mode run-to-run variance (32-task
    # scheduling + AQE replanning + Py4J latency) is ±20% on sub-2 s
    # queries; the min is the steady-state execution cost a cluster
    # scheduler would amortize.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
