"""Corpus-curation operators, wave 5: exact-substring scrubbing (the
span-surgery step of Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better"), dedup-quality evaluation (LSH vs exact-Jaccard
precision/recall), corpus snapshot diffing, deterministic training-shard
assignment, and trailing-window anomaly detection over event metrics.

Like the rest of the north-star family these have no reference citation
(the reference — gmallrealtime/src/main/scala — is an e-commerce
streaming warehouse); they are operations a 100 TB training-data
pipeline needs, expressed Spark-first.  Every oracle reproduces the
Spark result bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..caching import materialized
from ..functions import similarity as S
from ..functions.numeric import ratio_micro, ratio_micro_sql
from ..sources import load_table
from ..sources.tables import ensure_parallelism
from .registry import register

SPAN_K = 5  # exact-substring span width, in words


# ---------------------------------------------------------------------------
# Exact-substring scrub (span surgery)
# ---------------------------------------------------------------------------

@register(
    "exact_substring_scrub",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sp AS (
        SELECT doc_id, i AS pos,
               ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
               ws[i+4] || ' ' || ws[i+5] AS span
        FROM w, unnest(generate_series(0, len(ws) - {SPAN_K})) AS t(i)
        WHERE len(ws) >= {SPAN_K}
    ),
    st AS (SELECT span, count(DISTINCT doc_id) AS df, min(doc_id) AS canon
           FROM sp GROUP BY span),
    fl AS (SELECT sp.doc_id, sp.pos FROM sp JOIN st ON sp.span = st.span
           WHERE st.df >= 2 AND sp.doc_id != st.canon),
    cov AS (SELECT DISTINCT doc_id, pos + j AS p
            FROM fl, unnest(generate_series(0, {SPAN_K - 1})) AS u(j)),
    wp AS (SELECT doc_id, i - 1 AS p, ws[i] AS wd
           FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
    keep AS (
        SELECT wp.doc_id, wp.p, wp.wd FROM wp
        ANTI JOIN cov ON wp.doc_id = cov.doc_id AND wp.p = cov.p
    ),
    agg AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
    SELECT agg.doc_id AS doc_id, agg.n_removed AS n_removed,
           coalesce(string_agg(keep.wd, ' ' ORDER BY keep.p), '') AS clean_text
    FROM agg LEFT JOIN keep ON agg.doc_id = keep.doc_id
    GROUP BY agg.doc_id, agg.n_removed
    """,
    tags=("dedup", "substring", "training-data"),
)
def exact_substring_scrub(spark, sf_dir):
    """Exact-substring span surgery (Lee et al. 2022): every 5-word span
    that also appears in another document is REMOVED from all but its
    canonical (minimum-doc_id) occurrence, and the affected documents'
    text is rebuilt from the surviving words.  This is the step beyond
    ``cross_doc_span_overlap``'s per-doc counting — the output is the
    scrubbed corpus delta (only docs that lost words), ready to be
    anti-joined back over the corpus.

    Scale shape: spans explode scan-side and shuffle ONCE on the span
    key (the same exchange serves the frequency aggregate and the
    flagged join-back — a span shared by k docs costs k rows, never
    k²); flagged positions collapse to a per-doc covered-set (doc_id
    exchange of ints only — document BODIES never shuffle); the rebuild
    joins the covered-set back to the documents scan and filters the
    words array in place with an index lambda.  At 100 TB add a df-cap
    on the span stats (df<=1000) to bound hot-span fan-out, as
    ``minhash_containment`` does for shingles."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ws_d = d.select("doc_id", F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= SPAN_K
    )
    idx = F.sequence(F.lit(0), F.size("ws") - SPAN_K)
    spans = ws_d.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice("ws", i + 1, SPAN_K)).alias("span"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.span").persist()

    st = spans.groupBy("span").agg(
        F.count_distinct("doc_id").alias("df"), F.min("doc_id").alias("canon")
    )
    flagged = (
        spans.join(st, "span")
        .filter((F.col("df") >= 2) & (F.col("doc_id") != F.col("canon")))
        .select("doc_id", "pos")
    )
    cov = (
        flagged.select(
            "doc_id", F.explode(F.sequence("pos", F.col("pos") + SPAN_K - 1)).alias("p")
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("ps"))
        .select("doc_id", "ps", F.size("ps").alias("n_removed"))
    )
    result = ws_d.join(cov, "doc_id").select(
        "doc_id",
        F.col("n_removed").cast("bigint").alias("n_removed"),
        F.array_join(
            F.filter("ws", lambda w, i: ~F.array_contains("ps", i)), " "
        ).alias("clean_text"),
    )
    return materialized(result, spans)


# ---------------------------------------------------------------------------
# Dedup-quality evaluation: LSH candidates vs exact Jaccard
# ---------------------------------------------------------------------------

# exact-Jaccard truth set over the same 3-shingles the LSH pipeline uses;
# appended to the minhash pairs CTEs (which already define `shingles` and
# `pairs`)
_EVAL_ORACLE_TAIL = """
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
truth AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE __RM_JAC__ >= 500000
),
m AS (SELECT
    (SELECT count(*) FROM pairs) AS n_pred,
    (SELECT count(*) FROM truth) AS n_truth,
    (SELECT count(*) FROM pairs JOIN truth USING (doc_a, doc_b)) AS n_hit)
SELECT n_pred, n_truth, n_hit,
       CASE WHEN n_pred > 0
            THEN CAST(__RM_PRED__ AS DOUBLE) / 1000000 ELSE 0.0 END
           AS precision,
       CASE WHEN n_truth > 0
            THEN CAST(__RM_TRUTH__ AS DOUBLE) / 1000000 ELSE 0.0 END
           AS recall
FROM m
""".replace("__RM_PRED__", ratio_micro_sql("n_hit", "n_pred")).replace(
    "__RM_TRUTH__", ratio_micro_sql("n_hit", "n_truth")
).replace("__RM_JAC__", ratio_micro_sql("ni", "sa.n_sh + sb.n_sh - ni"))


@register(
    "dedup_eval",
    # oracle text is composed at import time in _register_dedup_eval_oracle
    # (needs llm_pipeline's generated minhash CTEs); placeholder replaced
    # below.
    oracle=None,
    tags=("dedup", "eval", "minhash"),
)
def dedup_eval(spark, sf_dir):
    """Dedup-quality evaluation harness — 'measure, don't guess' for the
    approximate dedup path: the MinHash+LSH candidate set (est_jaccard
    >= 0.5) is scored against the EXACT 3-gram-Jaccard >= 0.5 truth set,
    yielding corpus-level precision and recall in one row.  Run on a
    hash-sampled slice at 100 TB (the truth side's postings join is the
    expensive half); the LSH threshold/band geometry is then tuned
    against measured recall instead of the S-curve approximation.

    Scale shape: both pair sets reuse their existing production plans
    (banded LSH — no pair product; df-bounded shingle postings join);
    the scoring join is over pair keys only (two ints), and the final
    aggregate is a 3-scalar reduction."""
    docs = load_table(spark, sf_dir, "documents")
    # Both pair sets feed TWO consumers (their count agg + the hit join):
    # persist the tiny (int, int) pair lists so the LSH band join and the
    # exact shingle join each execute ONCE, not per consumer.
    pred_lazy, pred_caches = S.minhash_lsh_pairs_plan(docs, 0.5)
    pred = pred_lazy.select("doc_a", "doc_b").persist()
    truth_lazy, truth_caches = S.exact_jaccard_pairs_plan(docs, 0.5)
    truth = truth_lazy.select("doc_a", "doc_b").persist()
    hit = pred.join(truth, ["doc_a", "doc_b"], "left_semi")
    m = (
        pred.agg(F.count("*").alias("n_pred"))
        .crossJoin(truth.agg(F.count("*").alias("n_truth")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
    )
    zero = F.lit(0.0)
    result = m.select(
        "n_pred",
        "n_truth",
        "n_hit",
        F.when(
            F.col("n_pred") > 0,
            ratio_micro(F.col("n_hit"), F.col("n_pred")).cast("double")
            / 1000000,
        )
        .otherwise(zero)
        .alias("precision"),
        F.when(
            F.col("n_truth") > 0,
            ratio_micro(F.col("n_hit"), F.col("n_truth")).cast("double")
            / 1000000,
        )
        .otherwise(zero)
        .alias("recall"),
    )
    return materialized(result, pred, truth, *pred_caches, *truth_caches)


def _register_dedup_eval_oracle() -> None:
    """Compose dedup_eval's oracle from llm_pipeline's generated minhash
    CTEs (kept there because they are built from the frozen permutation
    constants)."""
    from . import llm_pipeline as LP
    from .registry import QUERIES

    QUERIES["dedup_eval"].oracle = (
        f"WITH {LP._MINHASH_PAIRS_CTES}, {_EVAL_ORACLE_TAIL.strip()}"
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff
# ---------------------------------------------------------------------------

@register(
    "corpus_diff",
    oracle="""
    WITH v1 AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 13 != 5
    ),
    v2 AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 7 = 0 THEN text || ' (rev2)'
                        ELSE text END) AS h
        FROM documents WHERE doc_id % 11 != 3
    )
    SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.h != v2.h
    """,
    tags=("versioning", "diff", "training-data"),
)
def corpus_diff(spark, sf_dir):
    """Corpus snapshot diff — the data-versioning primitive behind
    incremental re-training: given two corpus versions, classify every
    doc as added / removed / changed (unchanged docs are elided).  The
    two versions are derived deterministically from the one test corpus
    (v1 drops ``doc_id % 13 == 5``; v2 drops ``% 11 == 3`` and revises
    ``% 7 == 0`` texts).

    Scale shape: each side is reduced to (doc_id, content_hash) AT THE
    SCAN — document bodies never enter the join, so the full-outer join
    exchanges 16-byte digests keyed by doc_id.  With both snapshots
    bucketed by doc_id on disk the exchange disappears entirely; the
    diff streams at metadata cost, which is what makes daily 100 TB
    snapshot diffs feasible."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 13 != 5).select(
        F.col("doc_id").alias("id1"), F.md5("text").alias("h1")
    )
    v2 = (
        d.filter(F.col("doc_id") % 11 != 3)
        .select(
            F.col("doc_id").alias("id2"),
            F.md5(
                F.when(
                    F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" (rev2)"))
                ).otherwise(F.col("text"))
            ).alias("h2"),
        )
    )
    j = v1.join(v2, v1.id1 == v2.id2, "full_outer")
    return j.filter(
        F.col("id1").isNull() | F.col("id2").isNull() | (F.col("h1") != F.col("h2"))
    ).select(
        F.coalesce("id1", "id2").alias("doc_id"),
        F.when(F.col("id1").isNull(), F.lit("added"))
        .when(F.col("id2").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Deterministic training-shard assignment (global shuffle)
# ---------------------------------------------------------------------------

N_SHARDS = 8


@register(
    "shard_assignment",
    oracle=f"""
    WITH k AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    ),
    s AS (
        SELECT doc_id, h,
               (ascii(substr(h, 1, 1)) * 256 + ascii(substr(h, 2, 1)))
                   % {N_SHARDS} AS shard
        FROM k
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM s
    """,
    tags=("training-data", "sharding", "shuffle"),
)
def shard_assignment(spark, sf_dir):
    """Deterministic global training shuffle: every document is assigned
    to one of 8 output shards by a hash of its id, with a
    pseudo-random but REPRODUCIBLE within-shard order (md5 rank) — the
    final 'shuffle the corpus into training shards' step, stable across
    engines, cluster layouts, and reruns (unlike rand(seed), whose
    draws depend on row→partition assignment).

    Scale shape: shard and sort key derive scan-side; one exchange on
    shard (matching the shard-count write fan-out a writer needs
    anyway), and the within-shard rank is the per-output-file ordering
    pass the writer performs regardless.  Shards are uniform by
    construction (hash-balanced), so no skew handling is needed."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    k = d.select("doc_id", h.alias("h")).withColumn(
        "shard",
        (
            F.ascii(F.substring("h", 1, 1)) * 256
            + F.ascii(F.substring("h", 2, 1))
        )
        % N_SHARDS,
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return k.select(
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


# ---------------------------------------------------------------------------
# In-engine quality-classifier training (batch logistic regression)
# ---------------------------------------------------------------------------

_GD_ITERS = 3
_EN_STOP_SQL = "['the', 'a', 'of', 'and', 'is']"


def _gd_ctes(keep_id: bool) -> tuple[list[str], str, str]:
    """The shared SQL scaffold of the batch-GD logistic regression: the
    feature CTE ``f`` (optionally carrying doc_id through), the zeroed
    weight row, and one (gradient, weight-update) CTE pair per unrolled
    iteration.  Returns (ctes, final_weight_cte_name, z_expression)."""
    z = "w.w0 * 1.0 + w.w1 * f.f1 + w.w2 * f.f2 + w.w3 * f.f3"
    p = f"1.0 / (1.0 + exp(-({z})))"
    id_col = "doc_id,\n               " if keep_id else ""
    ctes = [
        f"""f AS (
        SELECT {id_col}CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               len(string_split(text, ' ')) / 100.0 AS f1,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> list_contains({_EN_STOP_SQL}, w)))
                    AS DOUBLE) / len(string_split(text, ' ')) AS f2,
               CAST(length(text) AS DOUBLE)
                    / len(string_split(text, ' ')) AS f3
        FROM documents WHERE len(string_split(text, ' ')) > 0
    )""",
        "w0cte AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)",
    ]
    prev = "w0cte"
    feats = ["1.0", "f.f1", "f.f2", "f.f3"]
    for i in range(1, _GD_ITERS + 1):
        sums = ", ".join(
            f"sum(CAST(round(({p} - f.y) * {fx}, 6) AS DECIMAL(18,6))) AS s{j}"
            for j, fx in enumerate(feats)
        )
        ctes.append(f"g{i} AS (SELECT count(*) AS n, {sums} FROM f, {prev} w)")
        upd = ", ".join(
            f"w.w{j} - CAST(g.s{j} AS DOUBLE) / g.n AS w{j}" for j in range(4)
        )
        ctes.append(f"wc{i} AS (SELECT {upd} FROM g{i} g, {prev} w)")
        prev = f"wc{i}"
    return ctes, prev, z


def _classifier_oracle() -> str:
    """Unrolled batch-GD logistic regression in pure SQL, iteration-exact
    with the Spark implementation: per-doc gradient terms are rounded to
    6 dp and summed as DECIMAL(18,6) (order-invariant), weights update
    in double."""
    ctes, prev, z = _gd_ctes(keep_id=False)
    zf = z.replace("f.f", "f")  # final-pass z over bare f columns
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT count(*) AS n,
           round(any_value(w.w0), 6) AS w0, round(any_value(w.w1), 6) AS w1,
           round(any_value(w.w2), 6) AS w2, round(any_value(w.w3), 6) AS w3,
           CAST({ratio_micro_sql(
               "sum(CASE WHEN ((" + zf + ") >= 0) = (y = 1.0) "
               "THEN 1 ELSE 0 END)",
               "count(*)",
           )} AS DOUBLE) / 1000000 AS accuracy
    FROM f, {prev} w"""
    )


def _classifier_score_oracle() -> str:
    """Same unrolled GD weight trajectory, then a per-document scoring
    pass: raw logit (pure double arithmetic over engine-identical
    weights — no exp in the output path), hard prediction, truth."""
    ctes, prev, z = _gd_ctes(keep_id=True)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT f.doc_id,
           round({z}, 6) AS logit,
           CASE WHEN ({z}) >= 0 THEN 1 ELSE 0 END AS pred_en,
           CAST(f.y AS INT) AS is_en
    FROM f, {prev} w"""
    )


def classifier_features(d):
    """(doc_id, y, f1, f2, f3) over any documents-shaped frame — narrow
    scan-side projections only, so the same expression tree serves the
    batch trainer/scorer AND the streaming ingest filter
    (``streaming.jobs.streaming_quality_filter``) unchanged."""
    ws = F.split("text", " ")
    sw = F.array(*[F.lit(s) for s in ["the", "a", "of", "and", "is"]])
    return d.filter(F.size(ws) > 0).select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.size(ws) / F.lit(100.0)).alias("f1"),
        (
            F.size(F.filter(ws, lambda w: F.array_contains(sw, w))).cast(
                "double"
            )
            / F.size(ws)
        ).alias("f2"),
        (F.length("text").cast("double") / F.size(ws)).alias("f3"),
    )


def classifier_logit(w):
    """The pinned-order logit column w·(1, f1, f2, f3) — the ONE
    evaluation-order definition shared by train, score, and the
    streaming filter (bit-identical doubles require identical order)."""
    return (
        F.lit(w[0]) * F.lit(1.0)
        + F.lit(w[1]) * F.col("f1")
        + F.lit(w[2]) * F.col("f2")
        + F.lit(w[3]) * F.col("f3")
    )


def _classifier_feats(spark, sf_dir):
    """The classifier's persisted feature table (doc_id, y, f1, f2, f3):
    one corpus scan projecting text down to 4 doubles + an id — the
    ~1000x reduction every GD iteration then re-reads from cache."""
    d = load_table(spark, sf_dir, "documents")
    return classifier_features(ensure_parallelism(d)).persist()


def _gd_weights(feats, fcols) -> list[float]:
    """Run the ``_GD_ITERS`` batch-gradient steps; each step is a
    map-side-partial aggregate to 4 scalars (6-dp DECIMAL gradient terms
    — order- and partitioning-invariant), weights ride to the next step
    as literals ('broadcast the model, reduce the gradient')."""
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_GD_ITERS):
        z = (
            F.lit(w[0]) * fcols[0]
            + F.lit(w[1]) * fcols[1]
            + F.lit(w[2]) * fcols[2]
            + F.lit(w[3]) * fcols[3]
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = feats.agg(
            F.count("*").alias("n"),
            *[
                F.sum(
                    F.round((p - F.col("y")) * fx, 6).cast("decimal(18,6)")
                ).alias(f"s{j}")
                for j, fx in enumerate(fcols)
            ],
        ).first()
        w = [w[j] - float(row[f"s{j}"]) / row["n"] for j in range(4)]
    return w


@register(
    "quality_classifier_train",
    oracle=_classifier_oracle(),
    tags=("ml", "classifier", "training-data"),
)
def quality_classifier_train(spark, sf_dir):
    """In-engine quality-classifier TRAINING (the CCNet/fastText-style
    step that usually leaves the warehouse): batch-gradient-descent
    logistic regression predicting lang=='en' from three scan-side text
    features (length/100, stopword ratio, mean word length), 3 unrolled
    iterations, lr=1.  Output: one row — corpus size, learned weights,
    training accuracy.

    Engine-exactness: per-doc gradient terms are round(·,6) →
    DECIMAL(18,6) before summing, so each gradient is order- and
    partitioning-invariant (the ``value_moments`` discipline) and the
    weight trajectory is bit-identical across engines; the per-row
    sigmoid's possible last-ulp exp() divergence is absorbed by the 6 dp
    rounding.

    Scale shape: features project once at the scan into a persisted
    4-double table (a ~1000x reduction — the corpus text is read
    exactly once); each GD step is then a map-side-partial aggregate to
    4 scalars (no shuffle of rows, just the partial-combine tree), and
    the 4 weights ride to the next step as literals — the classic
    'broadcast the model, reduce the gradient' layout that holds at any
    corpus size and any cluster width."""
    feats = _classifier_feats(spark, sf_dir)
    fcols = [F.lit(1.0), F.col("f1"), F.col("f2"), F.col("f3")]
    w = _gd_weights(feats, fcols)
    zf = (
        F.lit(w[0]) * fcols[0]
        + F.lit(w[1]) * fcols[1]
        + F.lit(w[2]) * fcols[2]
        + F.lit(w[3]) * fcols[3]
    )
    correct = F.when((zf >= 0) == (F.col("y") == 1.0), 1).otherwise(0)
    result = feats.agg(
        F.count("*").alias("n"),
        (
            ratio_micro(
                F.sum(correct).cast("long"), F.count("*")
            ).cast("double")
            / 1000000
        ).alias("accuracy"),
    ).select(
        "n",
        *[F.round(F.lit(w[j]), 6).alias(f"w{j}") for j in range(4)],
        "accuracy",
    )
    return materialized(result, feats)


@register(
    "quality_classifier_score",
    oracle=_classifier_score_oracle(),
    tags=("ml", "classifier", "training-data", "scoring"),
)
def quality_classifier_score(spark, sf_dir):
    """The INFERENCE half of ``quality_classifier_train`` — and the part
    that actually runs at 100 TB: train the same 3-step batch-GD
    logistic weights on the persisted 4-double feature table, then score
    EVERY document in one pass.  Output: (doc_id, logit, pred_en,
    is_en) — the raw margin a curation pipeline thresholds or buckets
    (cf. ``ccnet_quality_buckets``), not just the train-set accuracy
    scalar.

    Engine-exactness: the weights are engine-identical by the train
    op's DECIMAL-gradient discipline, and the per-doc output is the raw
    LOGIT (w·f in one pinned evaluation order — pure double arithmetic,
    no exp in the output path), so both engines emit the identical IEEE
    double before the 6-dp round.

    Scale shape: the corpus text is read exactly once (the feature
    projection, cached); GD touches only 4-scalar aggregates; the
    scoring pass is a ZERO-EXCHANGE map over the cached features with
    the 4 weights folded in as literals — the canonical 'model as
    broadcast constant' inference layout that is embarrassingly
    parallel at any cluster width."""
    feats = _classifier_feats(spark, sf_dir)
    fcols = [F.lit(1.0), F.col("f1"), F.col("f2"), F.col("f3")]
    w = _gd_weights(feats, fcols)
    z = classifier_logit(w)
    result = feats.select(
        "doc_id",
        F.round(z, 6).alias("logit"),
        F.when(z >= 0, 1).otherwise(0).cast("int").alias("pred_en"),
        F.col("y").cast("int").alias("is_en"),
    )
    return materialized(result, feats)


# ---------------------------------------------------------------------------
# Trailing-window anomaly detection on event metrics
# ---------------------------------------------------------------------------

@register(
    "anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
               sum(CAST(value AS DECIMAL(18,6))) AS s
        FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
    ),
    t AS (
        SELECT event_type, dt, CAST(s AS DOUBLE) AS v,
               count(*) OVER w AS n,
               CAST(sum(s) OVER w AS DOUBLE) AS ws,
               CAST(sum(s * s) OVER w AS DOUBLE) AS wss
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY dt
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, dt, round(v, 6) AS day_value,
           round((v - ws / n) /
                 sqrt((wss - ws * ws / n) / (n - 1)), 6) AS zscore,
           abs((v - ws / n) /
               sqrt((wss - ws * ws / n) / (n - 1))) >= 2.0 AS is_anomaly
    FROM t
    WHERE n >= 4 AND (wss - ws * ws / n) / (n - 1) > 0
    """,
    tags=("timeseries", "anomaly", "A6"),
)
def anomaly_zscore(spark, sf_dir):
    """Trailing-window anomaly detection: each (event_type, day) total is
    z-scored against the sample mean/std of its own PRECEDING <=7 days
    (the current day is excluded, so a spike can't mask itself), flagged
    at |z| >= 2 — the metric-monitoring op behind pipeline-health
    alerting (ingest-volume collapse, bot spikes).

    Scale shape: the daily rollup is the only corpus-scale exchange
    (map-side decimal partials); the window runs over the tiny
    (event_type, day) table partitioned by event_type.  Moments come
    from EXACT decimal power sums per frame, converted to double once —
    partitioning-invariant, same discipline as ``value_moments``."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("dt")
    ).agg(F.sum(v).alias("s"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("dt")
        .rowsBetween(-7, -1)
    )
    t = daily.select(
        "event_type",
        "dt",
        F.col("s").cast("double").alias("v"),
        F.count("*").over(w).alias("n"),
        F.sum("s").over(w).cast("double").alias("ws"),
        F.sum(F.col("s") * F.col("s")).over(w).cast("double").alias("wss"),
    )
    n, ws, wss = F.col("n"), F.col("ws"), F.col("wss")
    var = (wss - ws * ws / n) / (n - 1)
    z = (F.col("v") - ws / n) / F.sqrt(var)
    return t.filter((n >= 4) & (var > 0)).select(
        "event_type",
        "dt",
        F.round("v", 6).alias("day_value"),
        F.round(z, 6).alias("zscore"),
        (F.abs(z) >= 2.0).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Character-trigram entropy (gibberish / low-diversity detector)
# ---------------------------------------------------------------------------

ENTROPY_LOW = 6.0  # bits; below = repetitive / machine-generated suspect


@register(
    "char_ngram_entropy",
    oracle=f"""
    WITH tg AS (
        SELECT doc_id, substring(text, i, 3) AS tri
        FROM documents, unnest(generate_series(1, length(text) - 2)) AS t(i)
        WHERE length(text) >= 3
    ),
    cnt AS (SELECT doc_id, tri, count(*) AS c FROM tg GROUP BY 1, 2),
    agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CAST(round(c * log2(c), 6) AS DECIMAL(18,6)))
                    * 1000000 AS BIGINT) AS micro
        FROM cnt GROUP BY doc_id
    ),
    sel AS (
        SELECT doc_id, n,
               CAST(floor(log2(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
                 - ((2 * micro + n) // (2 * n)) AS em
        FROM agg
    )
    SELECT doc_id, n AS n_trigrams,
           CAST(em AS DOUBLE) / 1000000 AS entropy,
           em < {int(ENTROPY_LOW * 1_000_000)} AS is_low_entropy
    FROM sel
    """,
    tags=("text", "quality", "entropy", "gibberish", "training-data"),
)
def char_ngram_entropy(spark, sf_dir):
    """Character-trigram Shannon entropy per document — the classic
    gibberish / boilerplate / machine-spam detector (low entropy =
    repetitive character distribution; used alongside the Gopher rules
    and perplexity buckets as an orthogonal quality axis that needs no
    language model).

    Scale shape: ZERO exchange — entropy is a per-document local
    statistic, computed in one Arrow ``mapInPandas`` pass over the
    corpus scan (the trigram multiset never materializes row-wise, no
    (doc, trigram) shuffle like the oracle's relational phrasing).  At
    100 TB this is a pure map over the text column, fused with whatever
    scan feeds the curation pipeline.

    Cross-engine exactness: per-trigram terms c·log2(c) are rounded to
    6 dp and summed as exact integer micro-units (the oracle sums the
    same terms as DECIMAL(18,6)) — order-invariant, so the kernel's
    accumulation order cannot drift from DuckDB's.  The FINAL entropy is
    also assembled in exact integer micro-bits — ``floor(log2(n)·1e6 +
    0.5) − half_away(micro/n)`` (``functions.numeric`` discipline) —
    because ``round(double, 6)`` resolves decimal midpoints differently
    per engine: a power-of-two trigram count n makes the quotient land
    EXACTLY on the 5e-7 grid (found at sf0.1: a 128-trigram doc read
    6.344426 from the kernel's Python half-even round vs 6.344427 from
    DuckDB's half-away)."""
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_trigrams", T.LongType(), False),
            T.StructField("entropy", T.DoubleType(), False),
            T.StructField("is_low_entropy", T.BooleanType(), False),
        ]
    )

    def kernel(batches):
        import math  # noqa: PLC0415 — worker-side import
        from collections import Counter  # noqa: PLC0415

        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text) - 2
                if n < 1:
                    continue
                counts = Counter(text[i : i + 3] for i in range(n))
                micro = sum(
                    round(c * math.log2(c) * 1e6)
                    for c in counts.values()
                    if c > 1
                )
                # exact integer micro-bits: no engine-dependent midpoint
                # resolution in the final round (functions.numeric)
                em = int(math.floor(math.log2(n) * 1e6 + 0.5)) - (
                    (2 * micro + n) // (2 * n)
                )
                rows.append(
                    (int(doc_id), n, em / 1e6, em < ENTROPY_LOW * 1e6)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_trigrams", "entropy",
                               "is_low_entropy"]
            )

    return docs.select("doc_id", "text").mapInPandas(kernel, out_schema)


# ---------------------------------------------------------------------------
# T5-style span-corruption mask generation
# ---------------------------------------------------------------------------

CORRUPT_BLOCK = 20  # tokens per corruption block (one span per block)
CORRUPT_MIN_BLEN = 5  # skip runt trailing blocks with no room for a span


@register(
    "span_corruption_masks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents
    ),
    b AS (
        SELECT doc_id, ntok,
               unnest(generate_series(0,
                   CAST(ceil(ntok / {CORRUPT_BLOCK}.0) AS BIGINT) - 1)) AS blk
        FROM t WHERE ntok >= {CORRUPT_MIN_BLEN}
    ),
    s AS (
        SELECT doc_id, blk,
               least(ntok - blk * {CORRUPT_BLOCK}, {CORRUPT_BLOCK}) AS blen,
               md5(CAST(doc_id AS VARCHAR) || ':' ||
                   CAST(blk AS VARCHAR)) AS h
        FROM b
    ),
    p AS (
        SELECT doc_id, blk, blen,
               1 + ascii(substring(h, 1, 1)) % 3 AS span_len,
               ascii(substring(h, 2, 1)) AS a2
        FROM s WHERE blen >= {CORRUPT_MIN_BLEN}
    )
    SELECT doc_id, CAST(blk AS BIGINT) AS sentinel_id,
           CAST(blk * {CORRUPT_BLOCK}
                + a2 % (blen - span_len + 1) AS BIGINT) AS start_pos,
           CAST(span_len AS INT) AS span_len
    FROM p
    """,
    tags=("training-data", "corruption", "masking", "t5"),
)
def span_corruption_masks(spark, sf_dir):
    """Deterministic T5-style span-corruption masks: each document's
    token stream is cut into {blk}-token blocks; every block with at
    least {mn} tokens yields ONE masked span (length 1–3, position
    hash-derived), giving a ~10% corruption rate with non-overlapping
    spans BY CONSTRUCTION (one span per disjoint block) and sequential
    sentinel ids — no per-doc sequential state, unlike rejection-sampled
    span drawing.  Hash-deterministic (md5 of doc_id:block), so the
    masks are reproducible across engines, reruns, and cluster layouts
    — the property that makes data-ablation experiments comparable.

    Scale shape: ZERO exchange — block explode and span derivation are
    scan-side codegen expressions; output rows ≈ corpus_tokens / {blk}.
    """
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    t = docs.select("doc_id", ntok.alias("ntok")).filter(
        F.col("ntok") >= CORRUPT_MIN_BLEN
    )
    b = t.withColumn(
        "blk",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(F.col("ntok") / float(CORRUPT_BLOCK)) - 1,
            )
        ),
    )
    blen = F.least(
        F.col("ntok") - F.col("blk") * CORRUPT_BLOCK, F.lit(CORRUPT_BLOCK)
    )
    h = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("blk").cast("string"),
        )
    )
    s = b.select(
        "doc_id",
        "blk",
        blen.alias("blen"),
        h.alias("h"),
    ).filter(F.col("blen") >= CORRUPT_MIN_BLEN)
    span_len = 1 + F.ascii(F.substring("h", 1, 1)) % 3
    a2 = F.ascii(F.substring("h", 2, 1))
    p = s.select(
        "doc_id",
        "blk",
        "blen",
        span_len.alias("span_len"),
        a2.alias("a2"),
    )
    return p.select(
        "doc_id",
        F.col("blk").cast("bigint").alias("sentinel_id"),
        (
            F.col("blk") * CORRUPT_BLOCK
            + F.col("a2") % (F.col("blen") - F.col("span_len") + 1)
        )
        .cast("bigint")
        .alias("start_pos"),
        F.col("span_len").cast("int").alias("span_len"),
    )


span_corruption_masks.__doc__ = span_corruption_masks.__doc__.format(
    blk=CORRUPT_BLOCK, mn=CORRUPT_MIN_BLEN
)


# ---------------------------------------------------------------------------
# Corpus datasheet + epoch-seeded training shuffle
# ---------------------------------------------------------------------------

N_EPOCHS = 3


@register(
    "corpus_datasheet",
    oracle=f"""
    WITH a AS (
        SELECT count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               count(DISTINCT source) AS n_sources,
               sum(len(string_split(text, ' '))) AS n_tokens,
               sum(length(text)) AS n_chars,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en,
               count(DISTINCT md5(text)) AS n_distinct_texts
        FROM documents
    )
    SELECT n_docs, n_langs, n_sources,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST({ratio_micro_sql("n_en", "n_docs")} AS DOUBLE) / 1000000
               AS pct_en,
           n_docs - n_distinct_texts AS n_exact_dup_docs,
           CAST({ratio_micro_sql("n_tokens", "n_docs")} AS DOUBLE) / 1000000
               AS mean_tokens
    FROM a
    """,
    tags=("training-data", "datasheet", "audit"),
)
def corpus_datasheet(spark, sf_dir):
    """One-row corpus datasheet ('Datasheets for Datasets', Gebru et al.
    2021 — the summary card a corpus release ships with): document /
    language / source counts, token and char totals, English share,
    exact-duplicate count, mean document length.

    Engine-exactness: everything is exact int64 counts; the two ratios
    round in EXACT integer micro-units (functions.numeric half-away) —
    round(double, 6) on an integer ratio hits engine-divergent decimal
    midpoints.

    Scale shape: ONE corpus scan.  The three COUNT(DISTINCT)s plan as
    a single Expand (rows x4) feeding partial aggregates — the
    lang/source distincts are a handful of values and the text-digest
    distinct carries 16-byte hashes, never text, so the exchange is
    digest-sized.  (A production datasheet at 10¹⁰ docs would fold the
    digest distinct into the exact-dedup groupBy it already runs; here
    the one-pass form keeps the op self-contained.)"""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    nw = F.size(F.split("text", " "))
    a = d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(nw.cast("bigint")).alias("n_tokens"),
        F.sum(F.length("text").cast("bigint")).alias("n_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
    )
    return a.select(
        "n_docs",
        "n_langs",
        "n_sources",
        "n_tokens",
        "n_chars",
        (
            ratio_micro(F.col("n_en").cast("long"), F.col("n_docs")).cast(
                "double"
            )
            / 1000000
        ).alias("pct_en"),
        (F.col("n_docs") - F.col("n_distinct_texts")).alias(
            "n_exact_dup_docs"
        ),
        (
            ratio_micro(F.col("n_tokens"), F.col("n_docs")).cast("double")
            / 1000000
        ).alias("mean_tokens"),
    )


@register(
    "epoch_shuffle",
    oracle=f"""
    WITH e AS (
        SELECT d.doc_id, t.epoch,
               md5(CAST(t.epoch AS VARCHAR) || ':'
                   || CAST(d.doc_id AS VARCHAR)) AS h
        FROM documents d,
             (SELECT unnest(generate_series(0, {N_EPOCHS - 1})) AS epoch) t
    ),
    s AS (
        SELECT epoch, doc_id, h,
               (ascii(substr(h, 1, 1)) * 256 + ascii(substr(h, 2, 1)))
                   % {N_SHARDS} AS shard
        FROM e
    )
    SELECT CAST(epoch AS INT) AS epoch, doc_id, CAST(shard AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM s
    """,
    tags=("training-data", "sharding", "shuffle", "epochs"),
)
def epoch_shuffle(spark, sf_dir):
    """Per-EPOCH deterministic training shuffle — ``shard_assignment``
    with the epoch folded into the hash seed, so every epoch reads the
    corpus in a different but fully REPRODUCIBLE permutation (the data
    loader contract multi-epoch LLM training needs: epoch k's order must
    not repeat epoch k-1's, yet any node, engine, or rerun must derive
    the identical order — rand(seed) fails the second half because its
    draws depend on row-to-partition assignment).

    Scale shape: the epoch fan-out is a {N_EPOCHS}-element explode on
    the scan (epochs x corpus rows, the unavoidable output size);
    exactly one exchange on (epoch, shard) — the write fan-out a
    sharded-output writer needs anyway — and the within-shard rank is
    the per-file ordering pass the writer performs regardless."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    e = d.select(
        "doc_id",
        F.explode(F.array(*[F.lit(k) for k in range(N_EPOCHS)])).alias(
            "epoch"
        ),
    )
    h = F.md5(
        F.concat(
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    s = e.select("epoch", "doc_id", h.alias("h")).withColumn(
        "shard",
        (
            F.ascii(F.substring("h", 1, 1)) * 256
            + F.ascii(F.substring("h", 2, 1))
        )
        % N_SHARDS,
    )
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    return s.select(
        F.col("epoch").cast("int").alias("epoch"),
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
