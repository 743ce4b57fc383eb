"""Streaming sinks (SURVEY.md §2.2 K1-K5).

The reference's sinks are: a per-record Kafka producer (K1,
MyKafkaSender.scala:12-40 — idempotence intended but misconfigured), ES
bulk doc-id-keyed upsert (K4, MyEsUtil.scala:79-95), and Phoenix/HBase PK
upsert (K5, saveToPhoenix callers).  Their common semantic — *idempotent
keyed upsert so at-least-once delivery becomes effectively-once* — maps
to ``foreachBatch`` + MERGE.

THE WAREHOUSE'S DEFAULT SINKS LIVE IN ``manifest.py`` NOW: the
streaming jobs route through ``make_manifest_append_sink`` /
``make_manifest_upsert_sink`` (snapshot-isolated atomic commits,
touched-files-only MERGE, txn-idempotent replay) — the design-level fix
for everything this module's rename-swap protocols must document as a
limitation.  The raw-directory sinks below remain supported for plain
parquet layouts consumed by external readers that expect a bare
directory (and as the reference point the manifest layer's tests
compare against): MERGE is emulated as anti-join + union + atomic
directory swap; on a real deployment swap ``upsert_batch`` for ``MERGE
INTO dim USING updates ON ... WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT`` (same call-site contract).  Kafka sinks are thin:
``to_kafka_frame`` shapes (topic, key, value); the actual
``.format("kafka")`` write needs the kafka-sql jar at runtime.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
) -> None:
    """Idempotent keyed upsert of one micro-batch into a parquet table.

    New rows win over existing rows with the same key (the reference's
    doc-id overwrite semantic, MyEsUtil.scala:87-91).  Writes to a temp
    dir then RENAME-SWAPS: old → .old, tmp → live, drop .old.  The
    exposure window is two metadata renames (no data copy, no
    delete-before-replace — the first revision rmtree'd the live table
    before renaming the new one in, so a kill in that window lost the
    table unrecoverably); a crash between the renames leaves the
    complete previous table at ``.old``, which the next batch restores
    before merging.  Together with checkpointed offsets this
    reproduces the reference's at-least-once + idempotent-sink
    guarantee (OffsetManager.scala:33-46).  (A production deployment on
    an object store swaps via Delta/Iceberg commit instead; the
    recover-then-swap protocol here is the filesystem equivalent.)
    """
    old = f"{path}.old"
    # crash recovery: a previous run died between the two renames —
    # the complete prior table is at .old; restore it
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    shutil.rmtree(old, ignore_errors=True)

    batch = batch.dropDuplicates(keys)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(batch.select(*keys), keys, "left_anti")
        merged = keep.unionByName(batch)
    else:
        merged = batch
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def make_upsert_sink(path: str, keys: list[str]):
    """foreachBatch callback performing the keyed upsert (K4/K5)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        upsert_batch(batch.sparkSession, batch, path, keys)

    return sink


def make_append_sink(path: str, partition_by: list[str] | None = None):
    """foreachBatch callback appending dt-partitioned parquet (K3/K7 —
    the OLAP layer the reference delegates to ES/ClickHouse)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        w = batch.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    return sink


def to_kafka_frame(df: DataFrame, topic_col: str = "topic", key_col: str | None = None) -> DataFrame:
    """Shape a DataFrame for the Kafka sink: (topic, key, value=json(*)).

    The per-record ``topic`` column replaces the reference's
    one-job-per-table fan-out (K2, OdsGmallCanal.scala:46).
    """
    value = F.to_json(F.struct(*[c for c in df.columns if c != topic_col]))
    cols = [F.col(topic_col).alias("topic"), value.alias("value")]
    if key_col:
        cols.insert(1, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Small-file compaction for the append sink's parquet layout — the
    maintenance job every streaming-parquet table at 100 TB needs:
    ``make_append_sink`` writes one file set PER MICRO-BATCH, so a
    day-partition ingested in 1000 triggers holds 1000s of KB-sized
    files and every downstream scan pays 1000 file-open/footer costs.

    Per partition directory (or the root for unpartitioned tables):
    if it holds >= ``min_files`` parquet files, rewrite it to
    ceil(bytes / target_bytes) files via coalesce and swap
    (tmp write -> rename live to .old -> rename tmp live -> drop .old).
    Returns {partition_rel_path: (files_before, files_after)} for the
    audit log.

    CONCURRENCY CONTRACT: the swap is two renames, NOT atomic — between
    them the partition directory briefly does not exist, so compaction
    requires EXCLUSIVE access to the leaf being rewritten (pause readers
    of that partition, or compact only cold partitions — the normal
    table-maintenance discipline for raw filesystem layouts).  For
    read-during-compact without coordination use
    ``streaming.manifest.ManifestTable`` — its compact() commits through
    a versioned manifest, so concurrent readers keep their snapshot's
    immutable files and never need this contract.

    CRASH SAFETY: before the first rename a ``.compact-marker`` JSON is
    written next to the leaf recording {leaf, old, tmp}; if the process
    dies mid-swap, :func:`recover_compactions` replays the marker
    (restores the live data from whichever of old/tmp is complete) — no
    state is ever stranded under an undiscoverable name.  If the second
    rename fails in-process, the original directory is renamed back
    immediately.

    Scale notes: compaction is per-partition and embarrassingly parallel
    across partitions (run one job per partition or a driver loop like
    this one); coalesce (not repartition) avoids a shuffle — input files
    are merely concatenated split-wise; target_bytes uses on-disk size as
    the proxy the way table services (Delta OPTIMIZE, Iceberg rewrite)
    do."""
    import math

    results: dict[str, tuple[int, int]] = {}
    if partition_by:
        # enumerate leaf partition dirs (hive-style key=value nesting)
        leaves: list[str] = []

        def walk(d: str, depth: int) -> None:
            if depth == len(partition_by):
                leaves.append(d)
                return
            for name in sorted(os.listdir(d)):
                sub = os.path.join(d, name)
                if os.path.isdir(sub) and name.startswith(
                    partition_by[depth] + "="
                ):
                    walk(sub, depth + 1)

        walk(path, 0)
    else:
        leaves = [path]
    for leaf in leaves:
        files = [
            f
            for f in os.listdir(leaf)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if len(files) < min_files:
            continue
        total = sum(os.path.getsize(os.path.join(leaf, f)) for f in files)
        n_out = max(1, math.ceil(total / target_bytes))
        if n_out >= len(files):
            continue
        df = spark.read.parquet(leaf)
        tmp = f"{leaf}.compact-{uuid.uuid4().hex}"
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        old = f"{leaf}.old-{uuid.uuid4().hex}"
        marker = f"{leaf}.compact-marker"
        with open(marker, "w") as fh:
            json.dump({"leaf": leaf, "old": old, "tmp": tmp}, fh)
        os.rename(leaf, old)
        try:
            os.rename(tmp, leaf)
        except BaseException:
            os.rename(old, leaf)  # roll the live data back
            shutil.rmtree(tmp, ignore_errors=True)
            os.remove(marker)
            raise
        shutil.rmtree(old, ignore_errors=True)
        os.remove(marker)
        results[os.path.relpath(leaf, path)] = (len(files), n_out)
    return results


def recover_compactions(path: str) -> list[str]:
    """Replay interrupted :func:`compact_partitions` swaps under ``path``.

    For every stranded ``.compact-marker``: if the live leaf is missing,
    restore it — prefer the original (``old``, always complete once the
    marker exists) and fall back to the compacted ``tmp``; then drop the
    leftover side and the marker.  Idempotent — safe to run on every
    maintenance-job startup.  Returns the recovered leaf paths."""
    recovered: list[str] = []
    # the root's own marker sits NEXT TO path (leaf == path for
    # unpartitioned tables), outside the walk below
    markers = [f"{path}.compact-marker"]
    for dirpath, _dirs, files in os.walk(path):
        markers.extend(
            os.path.join(dirpath, n)
            for n in files
            if n.endswith(".compact-marker")
        )
    for marker in markers:
        if os.path.exists(marker):
            with open(marker) as fh:
                st = json.load(fh)
            leaf, old, tmp = st["leaf"], st["old"], st["tmp"]
            if not os.path.exists(leaf):
                if os.path.exists(old):
                    os.rename(old, leaf)  # original data wins
                elif os.path.exists(tmp):
                    os.rename(tmp, leaf)  # crash after old was dropped
                recovered.append(leaf)
            for leftover in (old, tmp):
                shutil.rmtree(leftover, ignore_errors=True)
            os.remove(marker)
    return recovered
