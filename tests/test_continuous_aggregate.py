"""ContinuousAggregate: incremental refresh scans only appended files,
merged partials equal a full recompute, non-append source ops force the
full fallback, and non-decomposable aggs are rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmallrealtime02_spark.sources import load_table
from gmallrealtime02_spark.streaming.manifest import ManifestTable
from gmallrealtime02_spark.streaming.rollup import ContinuousAggregate


def _events(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        .select(
            "event_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
        )
    )


def _ca(spark, tmp_path):
    src = ManifestTable(str(tmp_path / "src"))
    ca = ContinuousAggregate(
        src,
        str(tmp_path / "rollup"),
        group_cols=["dt", "event_type"],
        aggs={
            "n": ("count", "*"),
            "total": ("sum", "value"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
    )
    return src, ca


def _expected(spark, df):
    return {
        (r.dt, r.event_type): (r.n, round(r.total, 6), r.vmin, r.vmax)
        for r in df.groupBy("dt", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }


def _got(spark, ca):
    return {
        (r.dt, r.event_type): (r.n, round(r.total, 6), r.vmin, r.vmax)
        for r in ca.read(spark).collect()
    }


def test_incremental_refresh_matches_full_recompute(spark, sf_dir, tmp_path):
    src, ca = _ca(spark, tmp_path)
    src.append(_events(spark, sf_dir, 0, 300))
    r1 = ca.refresh(spark)
    assert r1["mode"] == "full"  # first materialization
    assert _got(spark, ca) == _expected(spark, _events(spark, sf_dir, 0, 300))

    src.append(_events(spark, sf_dir, 300, 500))
    src.append(_events(spark, sf_dir, 500, 600))
    r2 = ca.refresh(spark)
    assert r2["mode"] == "incremental"
    # only the two appended commits' files were scanned — O(new data)
    assert r2["files_scanned"] < len(src.files())
    assert _got(spark, ca) == _expected(spark, _events(spark, sf_dir, 0, 600))

    # nothing new -> noop, watermark already current
    assert ca.refresh(spark)["mode"] == "noop"


def test_compaction_forces_full_fallback(spark, sf_dir, tmp_path):
    """A compact rewrites the source's file set, so the version diff no
    longer enumerates additions — refresh detects the non-append op from
    the manifest chain and recomputes, never double-counts."""
    src, ca = _ca(spark, tmp_path)
    for lo in range(0, 400, 100):
        src.append(_events(spark, sf_dir, lo, lo + 100))
    ca.refresh(spark)
    src.compact(spark, target_bytes=1 << 30)
    src.append(_events(spark, sf_dir, 400, 500))
    r = ca.refresh(spark)
    assert r["mode"] == "full"
    assert _got(spark, ca) == _expected(spark, _events(spark, sf_dir, 0, 500))
    # and the chain is clean again afterwards: next append is incremental
    src.append(_events(spark, sf_dir, 500, 550))
    assert ca.refresh(spark)["mode"] == "incremental"
    assert _got(spark, ca) == _expected(spark, _events(spark, sf_dir, 0, 550))


def test_rollup_readers_get_snapshot_isolation(spark, sf_dir, tmp_path):
    """A reader holding the pre-refresh rollup version keeps it while a
    refresh replaces the live rollup (the ManifestTable guarantee,
    inherited for free)."""
    src, ca = _ca(spark, tmp_path)
    src.append(_events(spark, sf_dir, 0, 200))
    ca.refresh(spark)
    v = ca.rollup.current_version()
    old = ca.rollup.read(spark, version=v)
    old_rows = old.count()
    src.append(_events(spark, sf_dir, 200, 400))
    ca.refresh(spark)
    assert ca.rollup.current_version() > v
    assert old.count() == old_rows  # old snapshot intact


def test_non_decomposable_agg_rejected(tmp_path):
    src = ManifestTable(str(tmp_path / "src"))
    with pytest.raises(ValueError, match="decomposable"):
        ContinuousAggregate(
            src, str(tmp_path / "r"), ["dt"], {"a": ("avg", "value")}
        )


def test_rollup_maintenance_sink_per_batch(spark, sf_dir, tmp_path):
    """The foreachBatch maintenance sink: each micro-batch lands as one
    source commit plus one O(batch) incremental refresh; the rollup
    equals a full recompute after every batch."""
    from gmallrealtime02_spark.streaming.rollup import (
        make_rollup_maintenance_sink,
    )

    src, ca = _ca(spark, tmp_path)
    sink = make_rollup_maintenance_sink(src, ca)
    for i, lo in enumerate((0, 200, 400)):
        sink(_events(spark, sf_dir, lo, lo + 200), i)
        assert _got(spark, ca) == _expected(
            spark, _events(spark, sf_dir, 0, lo + 200)
        )
    # batches 2 and 3 refreshed incrementally (batch 1 is the initial full)
    assert ca.reflected_version() == src.current_version() == 3


def test_rollup_maintenance_sink_via_writestream(spark, sf_dir, tmp_path):
    """Real Structured Streaming end-to-end: a file-source stream driven
    through writeStream.foreachBatch(make_rollup_maintenance_sink) —
    after processAllAvailable the raw ManifestTable holds every row
    once, the rollup equals the batch aggregate, and version count
    equals trigger count (one atomic commit per micro-batch)."""
    from gmallrealtime02_spark.streaming.rollup import (
        make_rollup_maintenance_sink,
    )

    events = _events(spark, sf_dir, 0, 600)
    src_dir = str(tmp_path / "stream_src")
    # 3 files + maxFilesPerTrigger=1 -> exactly 3 micro-batches
    events.repartition(3).write.parquet(src_dir)
    src, ca = _ca(spark, tmp_path)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(make_rollup_maintenance_sink(src, ca))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert src.current_version() == 3  # one commit per trigger
    assert ca.reflected_version() == 3
    assert src.read(spark).count() == events.count()
    assert _got(spark, ca) == _expected(spark, events)


# -- delete-aware refreshes (round 10) ---------------------------------------


def test_rollup_absorbs_deletes_as_retractions(spark, sf_dir, tmp_path):
    """count/sum rollup: an upstream delete refreshes by NEGATED
    partials over the row-level CDC (mode 'retraction'), matching a
    from-scratch recompute exactly — including groups that vanish when
    their last row is retracted."""
    from gmallrealtime02_spark.streaming.manifest import ManifestTable
    from gmallrealtime02_spark.streaming.rollup import ContinuousAggregate

    src = ManifestTable(str(tmp_path / "src"), stats_cols=["event_id"])
    ca = ContinuousAggregate(
        src,
        str(tmp_path / "roll"),
        group_cols=["event_type"],
        aggs={"n": ("count", "*"), "sum_ids": ("sum", "event_id")},
    )
    ev = _events(spark, sf_dir, 0, 300)
    src.append(ev)
    ca.refresh(spark)
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    gone = types[0]
    src.delete_where(spark, f"event_type = '{gone}'")
    src.delete_where(spark, "event_id >= 250")
    r = ca.refresh(spark)
    assert r["mode"] == "retraction", r
    remaining = ev.filter(
        (F.col("event_type") != gone) & (F.col("event_id") < 250)
    )
    want = {
        (x.event_type, x.n, x.s)
        for x in remaining.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    got = {
        (x.event_type, x.n, x.sum_ids) for x in ca.read(spark).collect()
    }
    assert got == want
    # the fully-retracted group is GONE, not a zero row
    assert gone not in {t for t, _, _ in got}
    # __rows__ stays internal
    assert "__rows__" not in ca.read(spark).columns
    # and appends keep working incrementally afterwards
    src.append(_events(spark, sf_dir, 300, 350))
    assert ca.refresh(spark)["mode"] == "incremental"


def test_rollup_minmax_deletes_fall_back_to_full(spark, sf_dir, tmp_path):
    """min/max cannot un-see a deleted extremum: a delete in range
    forces the full recompute — and the result is still exact."""
    from gmallrealtime02_spark.streaming.manifest import ManifestTable
    from gmallrealtime02_spark.streaming.rollup import ContinuousAggregate

    src = ManifestTable(str(tmp_path / "src"), stats_cols=["event_id"])
    ca = ContinuousAggregate(
        src,
        str(tmp_path / "roll"),
        group_cols=["event_type"],
        aggs={"n": ("count", "*"), "max_id": ("max", "event_id")},
    )
    src.append(_events(spark, sf_dir, 0, 200))
    ca.refresh(spark)
    src.delete_where(spark, "event_id >= 150")  # removes maxima
    r = ca.refresh(spark)
    assert r["mode"] == "full"
    want = {
        (x.event_type, x.n, x.m)
        for x in _events(spark, sf_dir, 0, 150)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("event_id").alias("m"))
        .collect()
    }
    got = {
        (x.event_type, x.n, x.max_id) for x in ca.read(spark).collect()
    }
    assert got == want


def test_legacy_rollup_without_rows_upgrades_once(spark, sf_dir, tmp_path):
    """A pre-round-10 rollup (no __rows__ partial) takes ONE full
    recompute on its next refresh — the upgrade that writes the hidden
    count — then retracts incrementally."""
    from gmallrealtime02_spark.streaming.manifest import ManifestTable
    from gmallrealtime02_spark.streaming.rollup import ContinuousAggregate

    src = ManifestTable(str(tmp_path / "src"), stats_cols=["event_id"])
    ca = ContinuousAggregate(
        src,
        str(tmp_path / "roll"),
        group_cols=["event_type"],
        aggs={"n": ("count", "*")},
    )
    src.append(_events(spark, sf_dir, 0, 100))
    # hand-write a LEGACY rollup state: partials without __rows__
    legacy = (
        _events(spark, sf_dir, 0, 100)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    ca.rollup.replace(legacy, extra={"source_version": 1})
    src.append(_events(spark, sf_dir, 100, 200))
    r = ca.refresh(spark)
    assert r["mode"] == "full"  # the one-time upgrade
    src.delete_where(spark, "event_id < 20")
    assert ca.refresh(spark)["mode"] == "retraction"  # now incremental
    want = {
        (x.event_type, x.n)
        for x in _events(spark, sf_dir, 20, 200)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {(x.event_type, x.n) for x in ca.read(spark).collect()} == want
