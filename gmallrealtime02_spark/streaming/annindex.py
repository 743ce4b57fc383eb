"""IVF ANN index as MANIFEST-TABLE METADATA: centroids persist in the
table's config (content-addressed sidecar + config reference, so the
per-commit delta stays flat), every write assigns rows to their nearest
cell and clusters files by it, per-file cell ranges ride the ordinary
stats channel, and a top-k probe prunes FILES through the same
``pruned_files`` machinery range queries use — the table service
serving the repo's north-star ANN family without rebuilding an index
per run (round-9 verdict item 6).

The assignment math is the registry's deterministic IVF convention
(``functions/similarity.ann_ivf_topk``): sequential-fold cosine
(bit-identical to DuckDB's list_reduce and to a Python loop), ranked
with cell-id tie-breaks — so a manifest-served probe is hash-oracled
by the same SQL as the in-memory form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the persisted assignment column every ANN-configured write carries
ANN_CELL = "__ann_cell__"


def assign_cells(
    df: DataFrame, col: str, centroids: list[list[float]]
) -> DataFrame:
    """``df`` plus the :data:`ANN_CELL` int column: each row's nearest
    centroid by sequential-fold cosine, ties to the lower cell id —
    bit-identical to the oracle's CROSS JOIN + ROW_NUMBER assignment
    (struct max compares the cosine first, then the NEGATED cell id,
    so equal cosines resolve to the lower cell exactly like
    ``ORDER BY ccos DESC, cell ASC``).  ZERO shuffle and zero join:
    the centroid set unrolls into per-row whole-stage-codegen
    expressions — the shape that survives a 100 TB write path, unlike
    a per-row window rank."""
    from ..functions.similarity import _dot

    qn = F.sqrt(_dot(F.col(col), F.col(col)))
    cands = []
    for i, c in enumerate(centroids):
        cv = F.array(*[F.lit(float(x)) for x in c])
        cos_i = _dot(F.col(col), cv) / (qn * F.sqrt(_dot(cv, cv)))
        cands.append(
            F.struct(cos_i.alias("c"), F.lit(-i).alias("negcell"))
        )
    best = F.array_max(F.array(*cands))
    return df.withColumn(ANN_CELL, (-best["negcell"]).cast("int"))


def refit_centroids(
    df: DataFrame, col: str, centroids: list[list[float]], iters: int = 4
) -> list[list[float]]:
    """Executor-side Lloyd refinement of the IVF centroid set under
    the index's OWN metric (the fold-cosine argmax of
    :func:`assign_cells`, not L2): each round reassigns scan-side
    (zero exchanges — the centroid set rides the expression tree) and
    recomputes every cell's centroid as the exact-decimal MEAN of its
    members — the posexplode + partial-aggregation shape whose
    exchange carries k·dim partials, never the corpus.  Empty cells
    keep their previous centroid (k never shrinks).

    Seeded Lloyd alone cannot SPLIT a drift blob: when an upsert wave
    piles onto one centroid, no other centroid is nearest to any of
    its members, so the means converge with the skew intact.  Worse,
    reseeding a centroid AT a member never splits anything in high
    dimension — for roughly isotropic clusters cos(v, member) ≈
    cos(v, mean)², so the mean beats any raw member for every point
    (measured: a member-seeded cell captured ~0 rows).  Each round
    therefore ends with one BISECTION step (the BisectingKMeans
    idea): if the heaviest cell holds >2x the balanced share and ≥3x
    the lightest, a 2-means runs INSIDE that cell — seeded at two
    deterministically-chosen far-apart members, where member-vs-member
    comparisons are fair — and its two sub-MEANS become the heavy and
    lightest cells' new centroids, so the next global assignment
    genuinely halves the blob while the lightest cell's few members
    drain to their runner-up.  Decimal sums + deterministic seeds
    (quantile ranks, xxhash64 tiebreaks) make the refit a pure
    function of (data, seed centroids), so a maintenance commit can
    be replayed or raced safely."""
    cents = [[float(x) for x in c] for c in centroids]
    k = len(cents)
    body = df.select(F.col(col).alias("__v__"))
    from ..functions.similarity import _dot

    for _ in range(iters):
        a = assign_cells(body, "__v__", cents).persist()
        try:
            occ_rows = (
                a.groupBy(ANN_CELL).agg(F.count("*").alias("n")).collect()
            )
            occ = {int(r[ANN_CELL]): int(r["n"]) for r in occ_rows}
            total = sum(occ.values())
            if total == 0:
                return cents
            rows = (
                a.select(
                    ANN_CELL, F.posexplode("__v__").alias("pos", "x")
                )
                .groupBy(ANN_CELL, "pos")
                .agg(
                    (
                        F.sum(
                            F.col("x").cast("decimal(18,6)")
                        ).cast("double")
                        / F.count("*")
                    ).alias("mu")
                )
                .groupBy(ANN_CELL)
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "mu"))
                    ).alias("dims")
                )
                .select(ANN_CELL, F.col("dims.mu").alias("cvec"))
                .collect()
            )
            upd = {
                int(r[ANN_CELL]): [float(x) for x in r.cvec] for r in rows
            }
            cents = [upd.get(i, c) for i, c in enumerate(cents)]
            # balance step: split the heaviest cell into the lightest
            full = {i: occ.get(i, 0) for i in range(k)}
            heavy = min(full, key=lambda i: (-full[i], i))
            light = min(full, key=lambda i: (full[i], i))
            if (
                full[heavy] > 2 * total / k
                and full[heavy] >= 3 * max(full[light], 1)
            ):
                halves = _bisect_cell(
                    a.filter(F.col(ANN_CELL) == heavy).select("__v__"),
                    cents[heavy],
                    full[heavy],
                )
                if halves is not None:
                    cents[heavy], cents[light] = halves
        finally:
            a.unpersist()
    return cents


def _decimal_mean(members: DataFrame, group: "F.Column") -> dict:
    """Exact-decimal per-dimension means of ``__v__`` grouped by the
    boolean ``group`` column — {side: (mean_vec, count)} (absent key =
    empty side)."""
    rows = (
        members.select(group.alias("__g__"), "__v__")
        .select("__g__", F.posexplode("__v__").alias("pos", "x"))
        .groupBy("__g__", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("mu"),
            F.count("*").alias("n"),
        )
        .groupBy("__g__")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias(
                "dims"
            ),
            F.max("n").alias("n"),
        )
        .select("__g__", F.col("dims.mu").alias("cvec"), "n")
        .collect()
    )
    return {
        bool(r["__g__"]): ([float(x) for x in r["cvec"]], int(r["n"]))
        for r in rows
    }


def _bisect_cell(
    members: DataFrame,
    centroid: list[float],
    n: int,
    iters: int = 2,
) -> tuple[list[float], list[float]] | None:
    """Deterministic 2-means over ONE cell's members; returns the two
    sub-means (heavier side first), or None when the cell cannot split
    (fewer than 2 distinct vectors).  Seeds: the 25th-percentile
    member by fold-cosine to the cell centroid (inside a drift blob's
    outer shell, below the pre-drift strays' tail), and the member
    farthest from THAT seed among the inner half (cos-to-centroid
    above the median — strays excluded).  Member-vs-member
    comparisons are fair (no mean-vs-member bias), so two Lloyd
    rounds converge to a genuine directional split."""
    from ..functions.similarity import _dot

    cv = F.array(*[F.lit(float(x)) for x in centroid])
    qn = F.sqrt(_dot(F.col("__v__"), F.col("__v__")))
    cn = F.sqrt(_dot(cv, cv))
    scored = members.select(
        "__v__",
        (_dot(F.col("__v__"), cv) / (qn * cn)).alias("ccos"),
        F.xxhash64("__v__").alias("h"),
    ).persist()
    try:
        quart = n // 4 + 1
        m1_row = (
            scored.orderBy(F.col("ccos").asc(), F.col("h").asc())
            .limit(quart)
            .orderBy(F.col("ccos").desc(), F.col("h").desc())
            .first()
        )
        if m1_row is None:
            return None
        m1 = [float(x) for x in m1_row["__v__"]]
        v1 = F.array(*[F.lit(x) for x in m1])
        n1 = F.sqrt(_dot(v1, v1))
        inner = (
            scored.orderBy(F.col("ccos").desc(), F.col("h").desc())
            .limit(n // 2 + 1)
        )
        m2_row = (
            inner.select(
                "__v__",
                (_dot(F.col("__v__"), v1) / (qn * n1)).alias("c1"),
                "h",
            )
            .orderBy(F.col("c1").asc(), F.col("h").asc())
            .first()
        )
        if m2_row is None or [float(x) for x in m2_row["__v__"]] == m1:
            return None
        c1, c2 = m1, [float(x) for x in m2_row["__v__"]]
        n1 = n2 = 0
        sides = None
        for _ in range(iters):
            w1 = F.array(*[F.lit(float(x)) for x in c1])
            w2 = F.array(*[F.lit(float(x)) for x in c2])
            s1 = _dot(F.col("__v__"), w1) / (
                qn * F.sqrt(_dot(w1, w1))
            )
            s2 = _dot(F.col("__v__"), w2) / (
                qn * F.sqrt(_dot(w2, w2))
            )
            sides = _decimal_mean(scored, (s1 >= s2))
            if len(sides) < 2:
                break  # degenerate: everything on one side
            (c1, n1), (c2, n2) = sides[True], sides[False]
        if sides is None or len(sides) < 2:
            return None
        return (c1, c2) if n1 >= n2 else (c2, c1)
    finally:
        scored.unpersist()


def fold_cosine(a: list[float], b: list[float]) -> float:
    """Driver-side twin of ``functions.similarity._dot`` cosine: the
    same sequential IEEE-double fold order, so a probe ranked here
    agrees bit-for-bit with the executor/oracle ranking."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / (na**0.5 * nb**0.5)


def nearest_cells(
    qvec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """The ``n_probe`` nearest cell ids for one query vector — cosine
    descending, cell id ascending on ties (the oracle's ORDER BY)."""
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (-fold_cosine(qvec, centroids[i]), i),
    )
    return ranked[:n_probe]


def score_topk(
    spark: SparkSession,
    queries: list[tuple[int, list[float]]],
    probes: dict[int, list[int]],
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of each query against its probed cells'
    candidate rows: broadcast the (tiny) query block, score with the
    fold cosine rounded to 6 dp, rank with cid tie-breaks — the same
    scoring stage as ``ann_ivf_topk``, fed by manifest-pruned files
    instead of a full scan.  ``exclude_self=False`` for callers whose
    query ids are NOT table row ids (``read_ann``'s opaque vectors) —
    filtering there would silently drop the legitimate candidate whose
    row id happens to equal the placeholder."""
    from pyspark.sql import Window

    from ..functions.similarity import _dot

    qdf = F.broadcast(
        spark.createDataFrame(
            [
                (qid, [float(x) for x in vec], cell)
                for qid, vec in queries
                for cell in probes[qid]
            ],
            "qid long, qe array<double>, cell int",
        )
    )
    cand = qdf.join(
        candidates.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("ce"),
            F.col(ANN_CELL).alias("cell"),
        ),
        "cell",
    )
    if exclude_self:
        cand = cand.filter(F.col("qid") != F.col("cid"))
    dot = _dot(F.col("qe"), F.col("ce"))
    qn = F.sqrt(_dot(F.col("qe"), F.col("qe")))
    cn = F.sqrt(_dot(F.col("ce"), F.col("ce")))
    scored = cand.select(
        "qid", "cid", F.round(dot / (qn * cn), 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("cid").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
