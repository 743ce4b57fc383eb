"""ANN index as manifest-table metadata (streaming/annindex.py +
ManifestTable integration): assignment parity with the registry's
deterministic-IVF convention, config persistence across cold handles,
file-level pruning, and maintenance through upsert/compact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmallrealtime02_spark.sources import load_table
from gmallrealtime02_spark.streaming.annindex import (
    ANN_CELL,
    assign_cells,
    fold_cosine,
    nearest_cells,
)
from gmallrealtime02_spark.streaming.manifest import ManifestTable


def _centroids(spark, sf_dir, n=16):
    emb = load_table(spark, sf_dir, "embeddings")
    return [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < n).orderBy("vec_id").collect()
    ]


def _queries(spark, sf_dir, n=6):
    emb = load_table(spark, sf_dir, "embeddings")
    return [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < n).collect()
    ]


def test_assign_cells_matches_window_rank_convention(spark, sf_dir):
    """The zero-shuffle struct-argmax assignment must equal the
    ROW_NUMBER(ORDER BY ccos DESC, cell ASC) = 1 assignment the
    ann_ivf_topk oracle family defines — same fold cosine, same
    tie-break."""
    from pyspark.sql import Window

    from gmallrealtime02_spark.functions.similarity import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(spark, sf_dir)
    got = {
        r.vec_id: r[ANN_CELL]
        for r in assign_cells(emb, "embedding", cents).collect()
    }
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell int, cvec array<double>"
    )
    scored = emb.join(F.broadcast(cent_df)).withColumn(
        "ccos",
        _dot(F.col("embedding"), F.col("cvec"))
        / (
            F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
            * F.sqrt(_dot(F.col("cvec"), F.col("cvec")))
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cell").asc()
    )
    want = {
        r.vec_id: r.cell
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == want


def test_driver_side_fold_matches_executor_fold(spark, sf_dir):
    """nearest_cells ranks with a Python sequential fold that must be
    bit-identical to the executor's F.aggregate fold."""
    from gmallrealtime02_spark.functions.similarity import _dot

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    cents = _centroids(spark, sf_dir, n=4)
    rows = emb.collect()
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell int, cvec array<double>"
    )
    got = {
        (r.vec_id, r.cell): r.c
        for r in emb.join(F.broadcast(cent_df))
        .select(
            "vec_id",
            "cell",
            (
                _dot(F.col("embedding"), F.col("cvec"))
                / (
                    F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(_dot(F.col("cvec"), F.col("cvec")))
                )
            ).alias("c"),
        )
        .collect()
    }
    for r in rows:
        for i, c in enumerate(cents):
            py = fold_cosine([float(x) for x in r.embedding], c)
            assert py == got[(int(r.vec_id), i)], (r.vec_id, i)


def test_index_persists_and_prunes_from_cold_handle(spark, sf_dir, tmp_path):
    cents = _centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    t = ManifestTable(
        str(tmp_path / "t"), ann_col="embedding", ann_centroids=cents
    )
    t.append(emb)
    m = t.manifest()
    assert m["config"]["ann_col"] == "embedding"
    assert m["config"]["ann_centroids"].startswith("centroids-")
    # every file carries a recorded cell range
    assert all(ANN_CELL in st for st in m["stats"].values())
    cold = ManifestTable(str(t.root))
    assert cold.ann_centroids == cents  # sidecar roundtrip, exact doubles
    qs = _queries(spark, sf_dir)
    out, rep = cold.ann_topk(spark, qs, k=5, n_probe=3)
    assert rep["files_probed"] < rep["files_live"]  # pruning engaged
    # single-vector serving form agrees with the batch form: read_ann
    # knows no row identity, so probing with vec qs[0]'s own embedding
    # returns the row itself at rank 1 (cosine 1.0) plus the same
    # neighbors the batch form ranks
    qid, qvec = qs[0]
    single = cold.read_ann(spark, qvec, k=6, n_probe=3).orderBy(
        "rnk"
    ).collect()
    assert single[0].cid == qid and single[0].cosine == 1.0
    single_cids = {r.cid for r in single if r.cid != qid}
    batch_cids = {
        r.cid for r in out.filter(F.col("qid") == qid).collect()
    }
    assert batch_cids <= single_cids


def test_assignments_maintained_through_upsert_and_compact(
    spark, sf_dir, tmp_path
):
    """Upserted rows (no cell column on the incoming frame) are
    assigned before the merge; compact carries the stored cells and
    re-records stats — probe results stay identical, pruning only
    degrades (never wrongly skips)."""
    cents = _centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    t = ManifestTable(
        str(tmp_path / "t"), ann_col="embedding", ann_centroids=cents
    )
    t.append(emb.filter(F.col("vec_id") % 2 == 0))
    t.upsert(
        spark, emb.filter(F.col("vec_id") % 2 == 1), keys=["vec_id"]
    )
    assert ANN_CELL in t.read(spark).columns
    assert t.read(spark).filter(F.col(ANN_CELL).isNull()).count() == 0
    qs = _queries(spark, sf_dir)
    before, _ = t.ann_topk(spark, qs, k=5, n_probe=3)
    before_rows = sorted(
        (r.qid, r.cid, r.cosine, r.rnk) for r in before.collect()
    )
    # upserting the SAME keys again must not duplicate or reassign
    t.upsert(spark, emb.filter(F.col("vec_id") % 2 == 1), keys=["vec_id"])
    mid, _ = t.ann_topk(spark, qs, k=5, n_probe=3)
    assert (
        sorted((r.qid, r.cid, r.cosine, r.rnk) for r in mid.collect())
        == before_rows
    )
    t.compact(spark, target_bytes=1 << 30)
    after, rep = t.ann_topk(spark, qs, k=5, n_probe=3)
    assert (
        sorted((r.qid, r.cid, r.cosine, r.rnk) for r in after.collect())
        == before_rows
    )
    # compacted files still carry cell stats (correct, maybe coarser)
    assert all(
        ANN_CELL in st for st in t.manifest()["stats"].values()
    )


def test_nearest_cells_tie_breaks_to_lower_id():
    cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]  # duplicate centroids
    assert nearest_cells([2.0, 0.0], cents, 2) == [0, 1]
    assert nearest_cells([0.0, 3.0], cents, 1) == [2]


def test_unconfigured_table_raises(spark, sf_dir, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.append(load_table(spark, sf_dir, "embeddings").limit(10))
    with pytest.raises(ValueError):
        t.read_ann(spark, [0.0] * 64, k=5)


def test_read_ann_does_not_drop_row_id_zero(spark, sf_dir, tmp_path):
    """read_ann's query vector is opaque (no row identity): the
    legitimate candidate whose vec_id happens to be 0 must not be
    dropped by a self-exclusion against the internal placeholder id.
    Probing with vec 0's own embedding must return cid 0 at rank 1."""
    cents = _centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    t = ManifestTable(
        str(tmp_path / "t"), ann_col="embedding", ann_centroids=cents
    )
    t.append(emb)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first().embedding
    ]
    top = (
        t.read_ann(spark, qvec, k=3, n_probe=3)
        .orderBy("rnk")
        .collect()
    )
    assert top and top[0].cid == 0 and top[0].cosine == 1.0, top[:3]


def test_ann_maintain_noop_when_balanced(spark, sf_dir, tmp_path):
    cents = _centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    t = ManifestTable(
        str(tmp_path / "t"), ann_col="embedding", ann_centroids=cents
    )
    t.append(emb)
    v_before = t.current_version()
    r = t.ann_maintain(spark, skew_threshold=8.0)
    assert r["mode"] == "noop" and r["rows"] == emb.count()
    assert t.current_version() == v_before  # no commit on noop


def test_ann_maintain_recovers_pruning_after_drift(
    spark, sf_dir, tmp_path
):
    """The drift story end to end: a concentrated upsert wave piles
    rows and files into one hot cell, probes into that region open
    almost every drifted file, ann_maintain() refits/reassigns/
    re-clusters in ONE commit, and the same probes prune again —
    probed-file fraction back under the flat gate.  A cold handle
    reads the NEW index (sidecar + config versioned with the commit)
    and the maintained table still serves exact fold-cosine top-k."""
    cents = _centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    dim = int(dim_row["d"])
    t = ManifestTable(
        str(tmp_path / "t"), ann_col="embedding", ann_centroids=cents
    )
    t.append(emb)
    # drift wave: 4 appends whose vectors all collapse toward one
    # direction (0.02 * original + hot centroid) -> one hot cell
    hot = cents[7]
    drift = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x + 2.0 * "
            f"element_at(array({','.join(str(v) for v in hot)}), i + 1) "
            "AS float))"
        ).alias("embedding"),
        "label",
    )
    for w in range(4):
        t.append(
            drift.withColumn(
                "vec_id", F.col("vec_id") + w * 10_000
            )
        )
    # queries in the drifted region
    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in drift.limit(5).collect()
    ]
    _, rep_before = t.ann_topk(spark, qs, k=5, n_probe=3)
    frac_before = rep_before["files_probed"] / rep_before["files_live"]
    r = t.ann_maintain(spark, skew_threshold=2.0)
    assert r["mode"] == "refit", r
    assert r["skew_after"] < r["skew"], r
    out_after, rep_after = t.ann_topk(spark, qs, k=5, n_probe=3)
    frac_after = rep_after["files_probed"] / rep_after["files_live"]
    assert frac_after < frac_before, (frac_before, frac_after)
    # the flat gate: probing 3 of 16 cells over re-clustered files
    # opens a bounded share, not the drifted near-everything
    assert frac_after <= 0.5, (frac_before, frac_after)
    # cold handle serves the NEW index
    cold = ManifestTable(str(t.root))
    assert cold.ann_centroids == t.ann_centroids
    out_cold, rep_cold = cold.ann_topk(spark, qs, k=5, n_probe=3)
    assert rep_cold["files_probed"] == rep_after["files_probed"]
    a = {(x.qid, x.cid, x.rnk) for x in out_after.collect()}
    c = {(x.qid, x.cid, x.rnk) for x in out_cold.collect()}
    assert a == c
    # exactness within probed cells: each qid's results are the true
    # fold-cosine top-k of its probed cells' candidates
    from gmallrealtime02_spark.streaming.annindex import score_topk

    probes = {
        qid: nearest_cells(vec, t.ann_centroids, 3) for qid, vec in qs
    }
    want = {
        (x.qid, x.cid, x.rnk)
        for x in score_topk(
            spark, qs, probes, t.read(spark), "vec_id", "embedding", 5
        ).collect()
    }
    assert a == want


def test_ann_maintain_failed_commit_restores_handle(
    spark, sf_dir, tmp_path, monkeypatch
):
    """If the maintenance commit raises, the handle must keep serving
    the PUBLISHED centroid set (not the half-adopted refit)."""
    cents = _centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    t = ManifestTable(
        str(tmp_path / "t"), ann_col="embedding", ann_centroids=cents
    )
    t.append(emb)
    hot = cents[3]
    drift = emb.select(
        (F.col("vec_id") + 50_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x + 2.0 * "
            f"element_at(array({','.join(str(v) for v in hot)}), i + 1) "
            "AS float))"
        ).alias("embedding"),
        "label",
    )
    t.append(drift)

    def boom(*a, **kw):
        raise RuntimeError("injected commit failure")

    monkeypatch.setattr(t, "replace", boom)
    with pytest.raises(RuntimeError, match="injected"):
        t.ann_maintain(spark, skew_threshold=1.5)
    assert t.ann_centroids == cents  # handle restored
