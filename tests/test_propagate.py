"""IncrementalPropagator: bronze→silver manifest chaining — version-diff
reads, exactly-once txn ledger, full-recompute fallbacks on non-append
history (compact/delete), and multi-hop medallion composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmallrealtime02_spark.sources import load_table
from gmallrealtime02_spark.streaming.manifest import ManifestTable
from gmallrealtime02_spark.streaming.propagate import IncrementalPropagator


def _events(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        .select("event_id", "user_id", "event_type", "value")
    )


def _clicks_x10(df):
    return df.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 10.0
    )


def _ids(df):
    return sorted(r.event_id for r in df.select("event_id").collect())


def test_incremental_propagation_exactly_once(spark, sf_dir, tmp_path):
    bronze = ManifestTable(str(tmp_path / "bronze"))
    silver = ManifestTable(str(tmp_path / "silver"))
    p = IncrementalPropagator(bronze, silver, _clicks_x10)
    bronze.append(_events(spark, sf_dir, 0, 100))
    assert p.run_once(spark)["mode"] == "full"  # first run materializes
    bronze.append(_events(spark, sf_dir, 100, 200))
    bronze.append(_events(spark, sf_dir, 200, 300))
    r = p.run_once(spark)
    assert r["mode"] == "incremental" and r["source_version"] == 3
    want = _clicks_x10(_events(spark, sf_dir, 0, 300))
    assert _ids(silver.read(spark)) == _ids(want)
    assert silver.read(spark).agg(F.sum("value")).first()[0] == pytest.approx(
        want.agg(F.sum("value")).first()[0]
    )
    # replay/no-op: nothing new, nothing duplicated
    assert p.run_once(spark)["mode"] == "noop"
    assert _ids(silver.read(spark)) == _ids(want)


def test_propagation_full_fallback_on_delete(spark, sf_dir, tmp_path):
    """A delete upstream must REMOVE rows downstream (incremental
    append-only propagation cannot express that — the full fallback
    does, under the same txn ledger)."""
    bronze = ManifestTable(str(tmp_path / "bronze"), stats_cols=["event_id"])
    silver = ManifestTable(str(tmp_path / "silver"))
    p = IncrementalPropagator(bronze, silver, _clicks_x10)
    bronze.append(_events(spark, sf_dir, 0, 200))
    p.run_once(spark)
    bronze.delete_range(spark, "event_id", lo=0, hi=99)
    r = p.run_once(spark)
    assert r["mode"] == "full"
    assert _ids(silver.read(spark)) == _ids(
        _clicks_x10(_events(spark, sf_dir, 100, 200))
    )


def test_propagation_full_fallback_on_compact(spark, sf_dir, tmp_path):
    bronze = ManifestTable(str(tmp_path / "bronze"))
    silver = ManifestTable(str(tmp_path / "silver"))
    p = IncrementalPropagator(bronze, silver, _clicks_x10)
    for lo in range(0, 300, 100):
        bronze.append(_events(spark, sf_dir, lo, lo + 100))
    p.run_once(spark)
    bronze.compact(spark, target_bytes=1 << 30)
    bronze.append(_events(spark, sf_dir, 300, 400))
    r = p.run_once(spark)
    assert r["mode"] == "full"  # compact in range: diff-less, honest
    assert _ids(silver.read(spark)) == _ids(
        _clicks_x10(_events(spark, sf_dir, 0, 400))
    )
    # next append re-incrementalizes cleanly
    bronze.append(_events(spark, sf_dir, 400, 450))
    assert p.run_once(spark)["mode"] == "incremental"
    assert _ids(silver.read(spark)) == _ids(
        _clicks_x10(_events(spark, sf_dir, 0, 450))
    )


def test_medallion_chain_and_rollup_tail(spark, sf_dir, tmp_path):
    """bronze → silver (propagator) → gold (continuous aggregate): the
    full medallion chain stays exact through incremental runs."""
    from gmallrealtime02_spark.streaming.rollup import ContinuousAggregate

    bronze = ManifestTable(str(tmp_path / "bronze"))
    silver = ManifestTable(str(tmp_path / "silver"))
    p = IncrementalPropagator(bronze, silver, _clicks_x10)
    gold = ContinuousAggregate(
        silver,
        str(tmp_path / "gold"),
        group_cols=["event_type"],
        aggs={"n": ("count", "*"), "sum_users": ("sum", "user_id")},
    )
    for lo in range(0, 400, 100):
        bronze.append(_events(spark, sf_dir, lo, lo + 100))
        p.run_once(spark)
        gold.refresh(spark)
    want = (
        _clicks_x10(_events(spark, sf_dir, 0, 400))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("user_id").alias("sum_users"))
        .collect()
    )
    got = gold.read(spark).collect()
    assert {(r.event_type, r.n, r.sum_users) for r in got} == {
        (r.event_type, r.n, r.sum_users) for r in want
    }


def test_replayed_run_declined_by_txn(spark, sf_dir, tmp_path):
    """Simulated crash-rerun: a second propagator instance replaying the
    same source version is declined by the txn ledger (no duplicates),
    even via the full/replace path."""
    bronze = ManifestTable(str(tmp_path / "bronze"))
    silver = ManifestTable(str(tmp_path / "silver"))
    bronze.append(_events(spark, sf_dir, 0, 100))
    p1 = IncrementalPropagator(bronze, silver, _clicks_x10)
    p1.run_once(spark)
    v = silver.current_version()
    # a zombie with a stale view of the watermark replays version 1
    silver_stale = ManifestTable(str(tmp_path / "silver"))
    out = _clicks_x10(bronze.read(spark))
    assert silver_stale.replace(out, txn=("propagate", 1)) is None
    assert silver.current_version() == v


def test_full_recompute_is_version_pinned(spark, sf_dir, tmp_path):
    """The full path must read the source AT the captured version: a
    concurrent append landing mid-recompute must not leak into a commit
    whose txn watermark predates it (the next incremental run would
    duplicate those rows — the review's exactly-once hole)."""
    bronze = ManifestTable(str(tmp_path / "bronze"))
    silver = ManifestTable(str(tmp_path / "silver"))
    p = IncrementalPropagator(bronze, silver, _clicks_x10)
    bronze.append(_events(spark, sf_dir, 0, 100))
    # interleave: a writer appends AFTER run_once captured `now`
    orig_read = bronze.read
    raced = {"done": False}

    def racing_read(spark_, version=None):
        if not raced["done"]:
            raced["done"] = True
            ManifestTable(bronze.root).append(_events(spark, sf_dir, 100, 200))
        return orig_read(spark_, version=version)

    bronze.read = racing_read
    assert p.run_once(spark)["mode"] == "full"
    bronze.read = orig_read
    # the racing append is NOT in silver yet (watermark = version 1)...
    assert _ids(silver.read(spark)) == _ids(
        _clicks_x10(_events(spark, sf_dir, 0, 100))
    )
    # ...and the next run picks it up exactly once
    assert p.run_once(spark)["mode"] == "incremental"
    assert _ids(silver.read(spark)) == _ids(
        _clicks_x10(_events(spark, sf_dir, 0, 200))
    )


# -- DeltaJoinPropagator: two-source fan-in ---------------------------------

from gmallrealtime02_spark.streaming.propagate import DeltaJoinPropagator


def _users(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("user_id") >= lo) & (F.col("user_id") < hi))
        .select("user_id")
        .distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )


def _join_ev_users(ev, users):
    return ev.join(users, "user_id").select(
        "event_id", "user_id", "event_type", "value", "tier"
    )


def test_delta_join_incremental_matches_one_shot(spark, sf_dir, tmp_path):
    """After both sources advance, run_once joins only the version
    diffs (mode incremental) and the destination equals the one-shot
    join of the full sources — no pair twice, none missed."""
    left = ManifestTable(str(tmp_path / "ev"))
    right = ManifestTable(str(tmp_path / "users"))
    dest = ManifestTable(str(tmp_path / "joined"))
    p = DeltaJoinPropagator(left, right, dest, combine=_join_ev_users)
    assert p.run_once(spark)["mode"] == "noop"  # both sources empty
    left.append(_events(spark, sf_dir, 0, 400))
    assert p.run_once(spark)["mode"] == "noop"  # right still empty
    right.append(_users(spark, sf_dir, 0, 80))
    assert p.run_once(spark)["mode"] == "full"  # initial materialization
    left.append(_events(spark, sf_dir, 400, 900))
    right.append(_users(spark, sf_dir, 80, 160))
    r = p.run_once(spark)
    assert r["mode"] == "incremental"
    want = _join_ev_users(
        _events(spark, sf_dir, 0, 900), _users(spark, sf_dir, 0, 160)
    )
    assert _ids(dest.read(spark)) == _ids(want)
    assert dest.read(spark).count() == want.count()
    # replay: watermarks already recorded -> declined
    assert p.run_once(spark)["mode"] == "noop"


def test_delta_join_single_side_advance(spark, sf_dir, tmp_path):
    """Only one source advanced: the other's delta is the empty range;
    still incremental, still exact."""
    left = ManifestTable(str(tmp_path / "ev"))
    right = ManifestTable(str(tmp_path / "users"))
    dest = ManifestTable(str(tmp_path / "joined"))
    p = DeltaJoinPropagator(left, right, dest, combine=_join_ev_users)
    left.append(_events(spark, sf_dir, 0, 300))
    right.append(_users(spark, sf_dir, 0, 200))
    p.run_once(spark)
    left.append(_events(spark, sf_dir, 300, 600))
    r = p.run_once(spark)
    assert r["mode"] == "incremental"
    want = _join_ev_users(
        _events(spark, sf_dir, 0, 600), _users(spark, sf_dir, 0, 200)
    )
    assert _ids(dest.read(spark)) == _ids(want)


def test_delta_join_full_fallback_on_non_append(spark, sf_dir, tmp_path):
    """A compact (or delete) in either source's range breaks the
    version-diff premise — run_once must fall back to a full recompute
    (replace), never silently double-count."""
    left = ManifestTable(str(tmp_path / "ev"))
    right = ManifestTable(str(tmp_path / "users"))
    dest = ManifestTable(str(tmp_path / "joined"))
    p = DeltaJoinPropagator(left, right, dest, combine=_join_ev_users)
    left.append(_events(spark, sf_dir, 0, 200))
    left.append(_events(spark, sf_dir, 200, 400))
    right.append(_users(spark, sf_dir, 0, 150))
    p.run_once(spark)
    left.append(_events(spark, sf_dir, 400, 500))
    left.compact(spark, target_bytes=1 << 30)  # non-append in range
    r = p.run_once(spark)
    assert r["mode"] == "full"
    want = _join_ev_users(
        _events(spark, sf_dir, 0, 500), _users(spark, sf_dir, 0, 150)
    )
    assert _ids(dest.read(spark)) == _ids(want)
    assert p.run_once(spark)["mode"] == "noop"


def test_delta_join_vacuumed_time_travel_falls_back(spark, sf_dir, tmp_path):
    """The incremental path time-travels to 'old A'; if vacuum dropped
    that version's manifest, read_appended returns None and the run
    falls back to full — honest, never an error."""
    left = ManifestTable(str(tmp_path / "ev"))
    right = ManifestTable(str(tmp_path / "users"))
    dest = ManifestTable(str(tmp_path / "joined"))
    p = DeltaJoinPropagator(left, right, dest, combine=_join_ev_users)
    left.append(_events(spark, sf_dir, 0, 200))
    right.append(_users(spark, sf_dir, 0, 150))
    p.run_once(spark)
    left.append(_events(spark, sf_dir, 200, 300))
    left.append(_events(spark, sf_dir, 300, 400))
    left.vacuum(keep_versions=1, retention_seconds=0)  # history gone
    r = p.run_once(spark)
    assert r["mode"] == "full"
    want = _join_ev_users(
        _events(spark, sf_dir, 0, 400), _users(spark, sf_dir, 0, 150)
    )
    assert _ids(dest.read(spark)) == _ids(want)


def test_multi_txn_pair_atomic_watermarks(spark, sf_dir, tmp_path):
    """The txn pair-list: both watermarks land in ONE commit; a replay
    with every pair at-or-below declines; a partial advance commits."""
    t = ManifestTable(str(tmp_path / "t"))
    df = _events(spark, sf_dir, 0, 50)
    assert t.append(df, txn=[("a", 1), ("b", 2)]) is not None
    assert t.manifest()["txn"] == {"a": 1, "b": 2}
    # full replay: declined
    assert t.append(df, txn=[("a", 1), ("b", 2)]) is None
    # partial advance: commits, re-records the max per app
    assert t.append(df, txn=[("a", 2), ("b", 2)]) is not None
    assert t.manifest()["txn"] == {"a": 2, "b": 2}
