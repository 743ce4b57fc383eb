"""Accuracy gates for approximate aggregates (no oracle entry — the
sketches are engine-specific): HLL distinct counts and approx
percentiles must sit within their configured error bounds of the exact
answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallrealtime02_spark.plans.registry import load_all
from gmallrealtime02_spark.sources import load_table

QUERIES = load_all()


def test_hll_uniques_within_rsd(spark, sf_dir):
    approx = {
        r.dt: r.uniques_approx
        for r in QUERIES["daily_uniques_approx"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.dt: r.uniques
        for r in e.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt")
        .agg(F.countDistinct("user_id").alias("uniques"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for dt, ex in exact.items():
        rel_err = abs(approx[dt] - ex) / ex
        # rsd=0.02 is a standard deviation, not a hard cap; 5x headroom
        assert rel_err < 0.10, (dt, approx[dt], ex, rel_err)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    approx = {
        r.event_type: (r.p50, r.p90)
        for r in QUERIES["value_percentiles_approx"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: (r.p50, r.p90)
        for r in QUERIES["value_percentiles"].fn(spark, sf_dir).collect()
    }
    assert approx.keys() == exact.keys()
    for et, (p50e, p90e) in exact.items():
        p50a, p90a = approx[et]
        assert abs(p50a - p50e) / max(abs(p50e), 1e-9) < 0.05, (et, p50a, p50e)
        assert abs(p90a - p90e) / max(abs(p90e), 1e-9) < 0.05, (et, p90a, p90e)


def test_portable_hll_within_error(spark, sf_dir):
    """hll_distinct_daily (m=64 portable sketch) vs exact distincts:
    1.04/sqrt(64) ~ 13% rsd; gate at 2x headroom."""
    approx = {
        r.dt: r.hll_distinct
        for r in QUERIES["hll_distinct_daily"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.dt: r.uniques
        for r in e.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt")
        .agg(F.countDistinct("user_id").alias("uniques"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for dt, ex in exact.items():
        rel_err = abs(approx[dt] - ex) / ex
        assert rel_err < 0.26, (dt, approx[dt], ex, rel_err)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min guarantees estimate >= true count; with 1024 cells vs
    a small vocab, collisions should also keep it within 2x here."""
    rows = QUERIES["cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_count >= r.exact_count, r
        assert r.cms_count <= 2 * r.exact_count, r


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom membership never misses: every truly-contaminated shingle is
    flagged, so bloom_hits >= exact_hits per doc; aggregate false-positive
    rate stays under 5% of probed shingles (m=64Ki bits, k=3)."""
    rows = QUERIES["bloom_decontamination"].fn(spark, sf_dir).collect()
    assert rows
    fp = sum(r.bloom_hits - r.exact_hits for r in rows)
    probed = sum(r.n_shingles for r in rows)
    for r in rows:
        assert r.bloom_hits >= r.exact_hits, r
    assert fp / probed < 0.05, (fp, probed)


def test_pq_recall_vs_exact_l2(spark, sf_dir):
    """ann_pq_topk: 2-byte PQ codes vs exact L2 top-5.  The synthetic
    embeddings are near-uniform random — PQ's worst case (no cluster
    structure; distances concentrate) — so the gate is a floor against
    degenerate-to-random behavior (random recall@5 over 500 candidates
    ~ 0.01), not a production recall target."""
    from pyspark.sql import Window

    from gmallrealtime02_spark.functions.similarity import _dot  # noqa: F401

    pq: dict[int, set[int]] = {}
    for r in QUERIES["ann_pq_topk"].fn(spark, sf_dir).collect():
        pq.setdefault(r.qid, set()).add(r.cid)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double"), 6)).alias("e"),
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    j = q.crossJoin(emb).filter(F.col("qid") != F.col("vec_id")).select(
        "qid", "vec_id", d2.alias("d2")
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact: dict[int, set[int]] = {}
    for r in j.withColumn("rnk", F.row_number().over(w)).filter("rnk <= 5").collect():
        exact.setdefault(r.qid, set()).add(r.vec_id)
    assert pq.keys() == exact.keys()
    recalls = [len(pq[k] & exact[k]) / 5 for k in exact]
    assert sum(recalls) / len(recalls) >= 0.15, recalls


def test_ivfpq_prunes_and_recalls(spark, sf_dir):
    """ann_ivfpq_topk: results come only from the query's 4 probed cells
    (every returned cid's cell is one of the query's probe cells), and
    the composed approximation keeps a recall floor vs exact L2."""
    from pyspark.sql import Window

    rows = QUERIES["ann_ivfpq_topk"].fn(spark, sf_dir).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.qid, set()).add(r.cid)
    assert set(got) == set(range(10))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double"), 6)).alias("e"),
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    j = q.crossJoin(emb).filter(F.col("qid") != F.col("vec_id")).select(
        "qid", "vec_id", d2.alias("d2")
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact: dict[int, set[int]] = {}
    for r in j.withColumn("rnk", F.row_number().over(w)).filter("rnk <= 5").collect():
        exact.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [len(got[k] & exact[k]) / 5 for k in exact]
    # double approximation (cell pruning x PQ codes) on worst-case
    # uniform data: floor against degenerate behavior only
    assert sum(recalls) / len(recalls) >= 0.10, recalls


def test_histogram_quantiles_within_bin_width(spark, sf_dir):
    """histogram_quantiles: interpolation error is bounded by one bin
    width (hi-lo)/256 per event type, for both percentiles."""
    approx = {
        r.event_type: (r.p50, r.p90)
        for r in QUERIES["histogram_quantiles"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: (r.p50, r.p90)
        for r in QUERIES["value_percentiles"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    width = {
        r.event_type: (r.hi - r.lo) / 256
        for r in e.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et in exact:
        for a, x in zip(approx[et], exact[et]):
            assert abs(a - x) <= width[et] + 1e-9, (et, a, x, width[et])


def test_hll_rollup_merge_invariance(spark, sf_dir):
    """Building 10-day-bucket registers by merging daily tables must give
    the SAME estimates as sketching the raw events directly at bucket
    grain — the mergeability contract that lets persisted daily sketches
    serve any rollup level."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.plans.sketches import (
        HLL_ALPHA,
        HLL_M,
        hll_reg_rho_cols,
    )
    from gmallrealtime02_spark.sources import load_table

    rolled = {
        r.dt: (r.hit_registers, r.hll_distinct)
        for r in QUERIES["hll_rollup"].fn(spark, sf_dir).collect()
    }

    e = load_table(spark, sf_dir, "events")
    reg, rho = hll_reg_rho_cols(F.col("user_id").cast("string"))
    dt = F.date_format("ts", "yyyy-MM-dd")
    bucket = F.concat(
        F.substring(dt, 1, 7),
        F.lit("-D"),
        F.floor((F.substring(dt, 9, 2).cast("int") - 1) / 10).cast("string"),
    )
    direct_regs = (
        e.select(bucket.alias("dt"), reg.alias("reg"), rho.alias("rho"))
        .groupBy("dt", "reg")
        .agg(F.max("rho").alias("m"))
    )
    per = direct_regs.groupBy("dt").agg(
        F.count("*").alias("hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z_hit"),
    )
    raw = (HLL_ALPHA * HLL_M * HLL_M) / (F.col("z_hit") + (HLL_M - F.col("hit")))
    linear = HLL_M * F.log(F.lit(float(HLL_M)) / (HLL_M - F.col("hit")))
    est = F.when((raw <= 2.5 * HLL_M) & (F.col("hit") < HLL_M), linear).otherwise(raw)
    direct = {
        r.dt: (r.hit, r.est)
        for r in per.select(
            "dt",
            F.col("hit").cast("int").alias("hit"),
            F.round(est, 6).alias("est"),
        ).collect()
    }
    assert rolled == direct, (rolled, direct)


def test_hll_overlap_tracks_exact_intersection(spark, sf_dir):
    """Inclusion-exclusion over 64-register sketches must land near the
    exact |viewers ∩ purchasers| (loose bound: each of the three terms
    carries ~13% standard error and the subtraction compounds it)."""
    row = QUERIES["hll_overlap"].fn(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    viewers = e.filter(F.col("event_type") == "view").select("user_id").distinct()
    purch = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = viewers.join(purch, "user_id", "left_semi").count()
    assert exact > 0
    rel = abs(row.est_overlap - exact) / exact
    assert rel < 0.5, (row.est_overlap, exact, rel)


def test_histogram_quantiles_constant_series(spark):
    """hi == lo (a constant value column) must yield p50 = p90 = the
    constant, not a divide-by-zero NULL/NaN divergence (regression:
    Spark x/0 is NULL, DuckDB 0/0 is NaN — the bin expr now pins the
    degenerate range to bin 0 on both sides)."""
    import gmallrealtime02_spark.plans.sketches as sk

    sdf = spark.createDataFrame(
        [(i, "flat", 7.5) for i in range(40)],
        "event_id long, event_type string, value double",
    )
    orig = sk.load_table
    try:
        sk.load_table = lambda _s, _d, _t: sdf
        row = sk.histogram_quantiles(spark, "unused").collect()[0]
    finally:
        sk.load_table = orig
    assert (row.n, row.p50, row.p90) == (40, 7.5, 7.5), row
