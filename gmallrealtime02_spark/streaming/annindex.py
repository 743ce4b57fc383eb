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
