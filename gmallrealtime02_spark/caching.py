"""Cache lifecycle for multi-consumer query plans.

Several operators persist an intermediate (an exploded bigram table, a
signature table, a grouped fact) because 2+ downstream consumers read
it.  A registered query fn that RETURNS a lazy plan over such a cache
cannot unpersist it — the caller executes later — so earlier revisions
leaked executor storage across multi-query sessions (every cached RDD
stayed pinned until session end).

``materialized(result, *caches)`` is the standard exit: run the plan
now (``localCheckpoint(eager=True)`` — the result survives as its own
checkpointed RDD, typically small: scores, survivors, top-k), then
release the temporary caches.  Query fns that need plan-shape gates
split into a lazy ``_name_plan() -> (result, caches)`` builder (what
the gate inspects) plus a registered wrapper that materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialized(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Execute ``result`` eagerly, then unpersist the given caches."""
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for c in caches:
            c.unpersist()
