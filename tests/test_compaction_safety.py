"""compact_partitions crash-safety: in-process rollback when the second
rename fails, and marker-driven recovery after a simulated mid-swap
crash (both orders: before and after the old directory was dropped)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gmallrealtime02_spark.sources import load_table
from gmallrealtime02_spark.streaming.sinks import (
    compact_partitions,
    make_append_sink,
    recover_compactions,
)


def _fragmented_table(spark, sf_dir, tmp_path, n_batches=4):
    path = str(tmp_path / "olap")
    events = (
        load_table(spark, sf_dir, "events")
        .limit(400)
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    )
    sink = make_append_sink(path, partition_by=["dt"])
    for epoch in range(n_batches):
        sink(events.filter(F.col("event_id") % n_batches == epoch), epoch)
    ids = sorted(
        r.event_id
        for r in spark.read.parquet(path).select("event_id").collect()
    )
    return path, ids


def test_rollback_when_swap_in_rename_fails(spark, sf_dir, tmp_path, monkeypatch):
    """If rename(tmp -> leaf) raises, the original directory is renamed
    back, the tmp output and marker are cleaned up, and the table is
    byte-for-byte readable as before."""
    path, ids_before = _fragmented_table(spark, sf_dir, tmp_path)
    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        # per-leaf call 1 = leaf -> old, call 2 = tmp -> leaf
        if calls["n"] == 2:
            raise OSError("simulated rename failure")
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated"):
        compact_partitions(
            spark, path, partition_by=["dt"], target_bytes=1 << 30
        )
    monkeypatch.undo()
    # live data restored, nothing stranded
    ids_after = sorted(
        r.event_id
        for r in spark.read.parquet(path).select("event_id").collect()
    )
    assert ids_after == ids_before
    strays = [
        n
        for n in os.listdir(str(tmp_path))
        if ".old-" in n or ".compact-" in n
    ] + [
        n
        for n in os.listdir(path)
        if ".old-" in n or ".compact-" in n
    ]
    assert strays == [], strays


@pytest.mark.parametrize("drop_old", [False, True])
def test_recover_compactions_replays_mid_swap_crash(
    spark, sf_dir, tmp_path, drop_old
):
    """Simulate a crash between the two renames: the leaf is gone, the
    marker remains, and (drop_old=False) the old dir still holds the
    data, or (drop_old=True) only the compacted tmp output survives.
    recover_compactions restores the leaf either way, idempotently."""
    path, ids_before = _fragmented_table(spark, sf_dir, tmp_path)
    leaves = sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.startswith("dt=")
    )
    leaf = leaves[0]
    # build the same state compact_partitions creates right before the
    # second rename: tmp = compacted copy, leaf renamed away to old
    tmp = f"{leaf}.compact-deadbeef"
    spark.read.parquet(leaf).coalesce(1).write.mode("overwrite").parquet(tmp)
    old = f"{leaf}.old-deadbeef"
    marker = f"{leaf}.compact-marker"
    with open(marker, "w") as fh:
        json.dump({"leaf": leaf, "old": old, "tmp": tmp}, fh)
    os.rename(leaf, old)
    if drop_old:
        import shutil

        shutil.rmtree(old)  # crash landed after the old dir was dropped

    recovered = recover_compactions(path)
    assert recovered == [leaf]
    ids_after = sorted(
        r.event_id
        for r in spark.read.parquet(path).select("event_id").collect()
    )
    assert ids_after == ids_before
    assert not os.path.exists(old) and not os.path.exists(tmp)
    assert not os.path.exists(marker)
    # idempotent on a clean tree
    assert recover_compactions(path) == []
