"""Incremental table-to-table propagation over manifests — the
bronze→silver layer chaining (Delta's "streaming from a table" idea)
that completes the table service as a streaming substrate.

A downstream job over a raw directory must rescan everything per run;
over a :class:`~.manifest.ManifestTable` the VERSION DIFF enumerates
exactly the rows added since the last propagated version, so each run
costs O(new data).  The destination's per-app txn watermark doubles as
the source-version bookkeeping AND the exactly-once ledger: a replayed
run (crash after commit, rerun after restart) is declined by the same
CAS-checked txn rule every manifest sink uses — no separate offset
store, the Kafka-offset/Redis bookkeeping of the reference collapsed
into the destination table's own metadata (OffsetManager.scala:14-46).

``transform`` must be BATCH-LOCAL (row-wise select/filter/explode/
enrich-against-static): it is applied independently to each version
diff, so cross-row state would double-count.  Aggregations belong to
:class:`~.rollup.ContinuousAggregate` (merged partials); joins against
other STREAMS belong to Structured Streaming jobs (state store).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .manifest import ManifestTable


class IncrementalPropagator:
    def __init__(
        self,
        source: ManifestTable,
        dest: ManifestTable,
        transform: Callable[[DataFrame], DataFrame],
        app_id: str = "propagate",
    ) -> None:
        self.source = source
        self.dest = dest
        self.transform = transform
        self.app_id = app_id

    def reflected_version(self) -> int:
        """Highest source version already propagated (0 = nothing)."""
        return int(self.dest.manifest().get("txn", {}).get(self.app_id, 0))

    def run_once(self, spark: SparkSession) -> dict:
        """Propagate everything the source added since the last run.
        Returns {"mode": "noop" | "incremental" | "full",
        "source_version": N, "rows" | None}.

        Incremental: transform(version-diff rows) appended as ONE atomic
        commit carrying ``txn=(app_id, source_version)``.  Any
        non-append source step in the range (compact rewrote the file
        set — row-preserving but diff-less; replace/delete changed
        history) falls back to a FULL recompute committed as a replace
        under the same txn ledger — honest, never a silent double-count
        or a lingering deleted row.  Either path declined idempotently
        on replay."""
        now = self.source.current_version()
        since = self.reflected_version()
        if now == since:
            return {"mode": "noop", "source_version": now}
        diff = (
            self.source.read_appended(spark, since, now) if since else None
        )
        if since and diff is not None:
            out = self.transform(diff)
            self.dest.append(out, txn=(self.app_id, now))
            return {"mode": "incremental", "source_version": now}
        # pin the full recompute to the CAPTURED version: an unpinned
        # read racing a concurrent source append would include rows
        # beyond `now` while recording txn=now — the next incremental
        # run would then re-append them (duplicates)
        out = self.transform(self.source.read(spark, version=now))
        self.dest.replace(out, txn=(self.app_id, now))
        return {"mode": "full", "source_version": now}
