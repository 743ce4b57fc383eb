"""Feature-engineering / profiling wave beyond the round-4 corpus tools:
RAG-style overlapping chunking, one-pass table profiling, time-decayed
engagement (EWMA), linear text-classifier inference over hashed n-gram
features, and behavioral path mining.

No reference citation exists for these (the reference —
gmallrealtime/src/main/scala — is an e-commerce streaming warehouse);
they are the operations a training-data/RAG pipeline and a product
warehouse need at 100 TB, expressed Spark-first.  Every oracle uses the
same frozen integer constants as the Spark operator, so DuckDB
reproduces each value bit-for-bit (the repo-wide determinism-as-a-
scale-feature rule: results must not depend on row→partition layout).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.numeric import ratio_micro, ratio_micro_sql
from ..sources import load_table
from ..sources.tables import ensure_parallelism
from .registry import register

P = TX.HASH_MOD

# ---------------------------------------------------------------------------
# Overlapping sliding-window chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------

CHUNK_W = 12  # chunk width (words)
CHUNK_S = 6  # stride (words) — 50% overlap


@register(
    "doc_chunks",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id, i AS chunk_id,
           array_to_string(ws[i*{CHUNK_S}+1 : i*{CHUNK_S}+{CHUNK_W}], ' ') AS chunk,
           least(len(ws) - i*{CHUNK_S}, {CHUNK_W}) AS n_words
    FROM w, unnest(generate_series(0,
        CAST(floor((len(ws) - 1) / {CHUNK_S}.0) AS BIGINT))) AS t(i)
    """,
    tags=("text", "chunking", "rag", "training-data"),
)
def doc_chunks(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    return (
        d.select(
            "doc_id",
            ws.alias("ws"),
            n.alias("n"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((n - 1) / F.lit(CHUNK_S)),
                )
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.array_join(
                F.slice(
                    "ws",
                    (F.col("chunk_id") * CHUNK_S + 1).cast("int"),
                    F.lit(CHUNK_W),
                ),
                " ",
            ).alias("chunk"),
            F.least(
                F.col("n") - F.col("chunk_id") * CHUNK_S, F.lit(CHUNK_W).cast("long")
            ).alias("n_words"),
        )
    )


doc_chunks.__doc__ = """Overlapping sliding-window chunks ({w} words, stride {s}) — the
retrieval/context-window prep step: every token lands in ≥1 chunk and
interior tokens in 2, so no answer span is ever split across a hard
boundary (the reason RAG chunkers overlap).

Scale shape: ZERO exchange — the explode is scan-side, the blow-up
factor is a bounded ≤2× (width/stride), and each output row carries
only its own slice.  Chunk ids are per-document offsets, so the
operator is embarrassingly parallel and layout-independent at
100 TB (contrast boilerplate_lines' disjoint chunking in
corpus_tools.py, which feeds cross-doc grouping instead).
""".format(w=CHUNK_W, s=CHUNK_S)


# ---------------------------------------------------------------------------
# One-pass table profiling (the stats a CBO / data-quality monitor needs)
# ---------------------------------------------------------------------------

_STAT_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "table_stats",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
        CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        count(DISTINCT {c}) AS ndv FROM orders"""
        for c in _STAT_COLS
    ),
    tags=("profiling", "stats", "maintenance"),
)
def table_stats(spark, sf_dir):
    """Per-column profile of ``orders`` (row count, null count, exact NDV)
    — the statistics a cost-based optimizer and a data-quality monitor
    collect after every ingest.

    Scale shape: ONE scan.  Multiple exact COUNT(DISTINCT)s compile to
    Catalyst's Expand (k× row multiply) + a single partial-agg shuffle —
    the standard exact shape.  At 100 TB the same operator swaps exact
    NDV for the mergeable HLL sketch (see sketches.hll_distinct_daily);
    exact is kept here because profiling jobs run per-partition (a day's
    delta), not per-corpus, and the oracle must agree bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _STAT_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"ndv_{c}"))
    row = o.agg(*aggs)
    stats = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"ndv_{c}").alias("ndv"),
            )
            for c in _STAT_COLS
        ]
    )
    return row.select(F.explode(stats).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Time-decayed engagement: trailing EWMA of daily purchase value
# ---------------------------------------------------------------------------

EWMA_K = 8  # trailing horizon (days)
# Halving decay (α = 1/2): weights 2^-d are EXACT in both binary doubles
# and decimal(11,10), so the weighted sums stay bit-identical across
# engines and partition layouts (the same determinism trick as gap_fill's
# decimal day sums).
_EWMA_WEIGHTS = [Decimal(1) / (Decimal(2) ** k) for k in range(EWMA_K)]
_EWMA_W_SQL = (
    "[" + ", ".join(f"CAST('{w}' AS DECIMAL(11,10))" for w in _EWMA_WEIGHTS) + "]"
)


@register(
    "ewma_daily_value",
    oracle=f"""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(19,6)) AS day_value
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        GROUP BY 1, 2
    ),
    c AS (
        SELECT user_id, day + CAST(i AS INTEGER) AS day2,
               day_value * ({_EWMA_W_SQL})[i + 1] AS wv,
               ({_EWMA_W_SQL})[i + 1] AS w
        FROM ud, unnest(generate_series(0, {EWMA_K - 1})) AS t(i)
    )
    SELECT user_id, strftime(day2, '%Y-%m-%d') AS dt,
           CAST({ratio_micro_sql(
               "CAST(CAST(sum(wv) AS DECIMAL(24,16)) * 128000000 AS HUGEINT)",
               "CAST(CAST(sum(w) AS DECIMAL(20,16)) * 128000000 AS HUGEINT)",
           )} AS DOUBLE) / 1000000 AS ewma_value
    FROM c GROUP BY 1, 2
    """,
    tags=("timeseries", "window", "decay"),
)
def ewma_daily_value(spark, sf_dir):
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ud = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(19,6)")
            .alias("day_value")
        )
    )
    weights = F.array(
        *[F.lit(w).cast("decimal(11,10)") for w in _EWMA_WEIGHTS]
    )
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(EWMA_K - 1))).alias("d"),
        "day",
        "day_value",
    ).select(
        "user_id",
        F.date_add("day", F.col("d")).alias("day2"),
        (F.col("day_value") * F.element_at(weights, F.col("d") + 1)).alias("wv"),
        F.element_at(weights, F.col("d") + 1).alias("w"),
    )
    return (
        contrib.groupBy("user_id", "day2")
        .agg(F.sum("wv").alias("swv"), F.sum("w").alias("sw"))
        .select(
            "user_id",
            F.date_format("day2", "yyyy-MM-dd").alias("dt"),
            # the 2^-k weights integralize at x128, the 6-dp day sums at
            # x1e6 — so both sides of the ratio become exact longs and
            # the rounding is midpoint-exact (functions.numeric)
            (
                ratio_micro(
                    (F.col("swv").cast("decimal(24,16)") * 128000000).cast(
                        "long"
                    ),
                    (F.col("sw").cast("decimal(20,16)") * 128000000).cast(
                        "long"
                    ),
                ).cast("double")
                / 1000000
            ).alias("ewma_value"),
        )
    )


ewma_daily_value.__doc__ = """Exponentially-weighted trailing mean (α=1/2, horizon {k} days) of
each user's daily purchase value, evaluated at every day reached by
at least one observation — the recency-weighted engagement score
behind churn/LTV features.

Spark has no COUNT/AVG OVER (RANGE …) with per-row decay weights;
the scalable form is the same bounded contribution explode as
rolling_active_users: each (user, day) day-sum fans out to the ≤{k}
later days it still influences (bounded {k}× blow-up, independent of
corpus size), then ONE (user, day) aggregate.  Two exchanges total,
both on user-day keys, never event-sized.  All sums are decimal-
exact with power-of-two weights, so results are bit-identical across
engines and partitionings.""".format(k=EWMA_K)


# ---------------------------------------------------------------------------
# Linear text-classifier inference over hashed n-gram features
# ---------------------------------------------------------------------------

NGRAM_BUCKETS = 4096
_PAIR_MUL = 1009
_W_MUL = 2654435761  # Knuth multiplicative constant
_W_MOD = 2001  # weights land in [-1000, 1000]

# final score rounded in EXACT integer space (functions.numeric): the
# sum_w/(1000·n) ratio is an exact integer ratio, so round(double, 6)
# lands on engine-divergent decimal midpoints at corpus scale
_score_micro_sql = ratio_micro_sql("sum_w", "1000 * n_bigrams")


@register(
    "hashed_ngram_score",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    h AS (
        SELECT doc_id, len(ws) AS nw,
               list_transform(ws, w -> list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, length(w)),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % {P})) AS wh
        FROM w
    ),
    p AS (
        SELECT doc_id, nw - 1 AS n_bigrams,
               list_transform(generate_series(1, nw - 1),
                   i -> ((((wh[i] * {_PAIR_MUL} + wh[i+1]) % {NGRAM_BUCKETS})
                          * {_W_MUL}) % {_W_MOD}) - 1000) AS wt
        FROM h
    ),
    s AS (
        SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
               list_reduce(list_prepend(CAST(0 AS BIGINT), wt),
                           (a, b) -> a + b) AS sum_w
        FROM p
    )
    SELECT doc_id, n_bigrams,
           CASE WHEN n_bigrams > 0
                THEN CAST({_score_micro_sql} AS DOUBLE) / 1000000
                ELSE 0.0 END AS score,
           CASE WHEN n_bigrams > 0 THEN sum_w > 0 ELSE FALSE END AS keep
    FROM s
    """,
    tags=("text", "classifier", "quality", "training-data"),
)
def hashed_ngram_score(spark, sf_dir):
    # spread the one-split scan: the per-char portable_hash fold is an
    # INTERPRETED higher-order expression (~µs per element), and with no
    # exchange anywhere the whole corpus otherwise hashes on one task
    # (guide §2.6 idle capacity; measured 2.85 s -> 0.43 s at sf0.1,
    # row-local arithmetic so results are partitioning-invariant)
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.col("text"), " ")
    wh = F.transform(ws, lambda w: TX.portable_hash(w))
    n = F.size(ws)
    pairs = F.zip_with(
        F.slice(wh, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(wh, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: (a * _PAIR_MUL + b) % NGRAM_BUCKETS,
    )
    wts = F.transform(pairs, lambda b: (b * _W_MUL) % _W_MOD - 1000)
    sum_w = F.aggregate(wts, F.lit(0).cast("long"), lambda acc, x: acc + x)
    n_bigrams = (n - 1).cast("long")
    return d.select(
        "doc_id",
        n_bigrams.alias("n_bigrams"),
        F.when(
            n_bigrams > 0,
            ratio_micro(sum_w, n_bigrams * 1000).cast("double") / 1000000,
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
        F.when(n_bigrams > 0, sum_w > 0).otherwise(F.lit(False)).alias("keep"),
    )


hashed_ngram_score.__doc__ = """fastText-style linear classifier INFERENCE: hash each word bigram
into {b} feature buckets, dot with a weight vector, threshold — the
shape of every learned quality/toxicity filter applied at corpus
scale (the model is frozen at inference; weights here come from a
deterministic integer formula so the oracle reproduces them, but the
plan is identical with trained weights broadcast as a {b}-entry
array — bounded by design, unlike a vocab-sized table).

Scale shape: ZERO exchange — hashing, lookup, and the dot product
all run scan-side inside codegen via array folds; integer arithmetic
end-to-end INCLUDING the final 6-dp rounding (exact half-away micro
units, functions.numeric — round(double, 6) had engine-divergent
midpoints at sf0.1), so the score is bit-identical across engines
and layouts.""".format(b=NGRAM_BUCKETS)


# ---------------------------------------------------------------------------
# Behavioral path mining: most common 3-event sequences
# ---------------------------------------------------------------------------

TRIGRAM_TOP = 20


@register(
    "event_trigrams",
    oracle=f"""
    WITH s AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
    FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT {TRIGRAM_TOP}
    """,
    tags=("window", "path-mining", "behavior"),
)
def event_trigrams(spark, sf_dir):
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(TRIGRAM_TOP)
    )


event_trigrams.__doc__ = """Top-{k} most common 3-event user paths (Markov path mining — the
open-ended complement of event_funnel's fixed stage list): sliding
window of 3 consecutive events per user, global frequency ranking.

Scale shape: ONE user_id exchange feeds the lead() window; the path
aggregate shuffles ≤|event_type|³ distinct keys with map-side
partials; the final ranking is a distributed TakeOrderedAndProject
(never a single-reducer global sort).  Ties broken by path string so
the top-{k} is deterministic.""".format(k=TRIGRAM_TOP)


# ---------------------------------------------------------------------------
# One-pass data-quality constraint suite (Deequ-style verification)
# ---------------------------------------------------------------------------

DQ_PRICE_LO, DQ_PRICE_HI = 0.0, 1_000_000.0
DQ_STATUSES = ("O", "F", "P")


@register(
    "dq_checks",
    oracle=f"""
    WITH m AS (
        SELECT count(*) AS n,
               count(o_totalprice) AS n_price,
               count(DISTINCT o_orderkey) AS n_keys,
               sum(CASE WHEN o_totalprice <= {DQ_PRICE_LO}
                          OR o_totalprice >= {DQ_PRICE_HI}
                        THEN 1 ELSE 0 END) AS range_viol,
               sum(CASE WHEN o_orderstatus NOT IN
                        {DQ_STATUSES!r}
                        THEN 1 ELSE 0 END) AS domain_viol
        FROM orders
    ),
    orph AS (
        SELECT count(*) AS orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
    )
    SELECT * FROM (
        SELECT 'row_count_nonzero' AS check_name,
               CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM m
        UNION ALL
        SELECT 'completeness_o_totalprice',
               CAST({ratio_micro_sql("n_price", "n")} AS DOUBLE) / 1000000,
               n_price = n FROM m
        UNION ALL
        SELECT 'uniqueness_o_orderkey',
               CAST({ratio_micro_sql("n_keys", "n")} AS DOUBLE) / 1000000,
               n_keys = n FROM m
        UNION ALL
        SELECT 'range_o_totalprice',
               CAST(range_viol AS DOUBLE), range_viol = 0 FROM m
        UNION ALL
        SELECT 'domain_o_orderstatus',
               CAST(domain_viol AS DOUBLE), domain_viol = 0 FROM m
        UNION ALL
        SELECT 'referential_o_custkey',
               CAST(orphans AS DOUBLE), orphans = 0 FROM orph
    )
    """,
    tags=("quality", "profiling", "constraints"),
)
def dq_checks(spark, sf_dir):
    """Deequ-style data-quality verification suite over the orders fact:
    six constraints — non-empty, completeness(o_totalprice),
    uniqueness(o_orderkey), numeric range, categorical domain, and
    referential integrity against customer — evaluated in ONE pass over
    orders, emitted as (check_name, metric, passed) rows a pipeline can
    gate deploys on.

    Scale shape: all six metrics fold into a single aggregate over one
    orders scan — the referential check rides the same pass as a
    broadcast LEFT join on the DISTINCT customer KEY column (never the
    fact; distinct makes the fold immune to a dirty dim with duplicated
    keys, which would otherwise multiply order rows into every metric)
    with a null-mark conditional sum, so there is no separate anti-join
    branch re-reading the fact; count / conditional sums are map-side
    partials, and the COUNT DISTINCT adds the one unavoidable
    o_orderkey exchange.  At dim sizes past the broadcast threshold the
    join degrades to a shuffle join on the key columns alone (no hint
    pinned).  The per-check rows come from exploding a 6-struct literal
    array over the single metrics row — no extra scans, no driver-side
    loop."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    ck = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("ck"))
        .distinct()
    )
    # one scan: the referential check folds into the same aggregate as
    # the scan metrics — a broadcast LEFT join marks orphans (null ck)
    # and a conditional sum counts them, so orders is read ONCE instead
    # of once for metrics + once for a separate anti join.  The key side
    # is DISTINCT first: a duplicated c_custkey (exactly the dirty-dim
    # condition a DQ suite exists to catch) would otherwise duplicate
    # matching order rows through the left join and corrupt all five
    # scan metrics; distinct on the dim key column is dim-sized, cheap
    row = o.join(F.broadcast(ck), o.o_custkey == ck.ck, "left").agg(
        F.count("*").alias("n"),
        F.count("o_totalprice").alias("n_price"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= DQ_PRICE_LO)
                | (F.col("o_totalprice") >= DQ_PRICE_HI),
                1,
            ).otherwise(0)
        ).alias("range_viol"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*DQ_STATUSES), 1).otherwise(0)
        ).alias("domain_viol"),
        F.sum(F.when(F.col("ck").isNull(), 1).otherwise(0)).alias("orphans"),
    )

    def _chk(name, metric, passed):
        return F.struct(
            F.lit(name).alias("check_name"),
            metric.cast("double").alias("metric"),
            passed.alias("passed"),
        )

    return row.select(
        F.explode(
            F.array(
                _chk("row_count_nonzero", F.col("n"), F.col("n") > 0),
                _chk(
                    "completeness_o_totalprice",
                    ratio_micro(F.col("n_price"), F.col("n")).cast("double")
                    / 1000000,
                    F.col("n_price") == F.col("n"),
                ),
                _chk(
                    "uniqueness_o_orderkey",
                    ratio_micro(F.col("n_keys"), F.col("n")).cast("double")
                    / 1000000,
                    F.col("n_keys") == F.col("n"),
                ),
                _chk(
                    "range_o_totalprice",
                    F.col("range_viol"),
                    F.col("range_viol") == 0,
                ),
                _chk(
                    "domain_o_orderstatus",
                    F.col("domain_viol"),
                    F.col("domain_viol") == 0,
                ),
                _chk(
                    "referential_o_custkey",
                    F.col("orphans"),
                    F.col("orphans") == 0,
                ),
            )
        ).alias("c")
    ).select("c.*")


# ---------------------------------------------------------------------------
# Embedding QA (norm profile + outlier flags before indexing)
# ---------------------------------------------------------------------------

_NORM_FOLD = (
    "round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(a, b) -> a + b)), 6)"
)


@register(
    "embedding_norm_stats",
    oracle=f"""
    WITH t AS (
        SELECT vec_id, {_NORM_FOLD} AS l2_norm,
               round(list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
        FROM embeddings
    ), s AS (
        SELECT round(quantile_cont(l2_norm, 0.01), 6) AS norm_p01,
               round(quantile_cont(l2_norm, 0.99), 6) AS norm_p99,
               round(quantile_cont(max_abs, 0.99), 6) AS spike_p99
        FROM t
    )
    SELECT vec_id, l2_norm, max_abs,
           CAST(CASE WHEN l2_norm < norm_p01 THEN 1 ELSE 0 END AS INTEGER) AS is_low,
           CAST(CASE WHEN l2_norm > norm_p99 THEN 1 ELSE 0 END AS INTEGER) AS is_high,
           CAST(CASE WHEN max_abs > spike_p99 THEN 1 ELSE 0 END AS INTEGER) AS is_spiky
    FROM t CROSS JOIN s
    """,
    tags=("embeddings", "quality", "profiling"),
)
def embedding_norm_stats(spark, sf_dir):
    """Embedding QA before anything indexes or trains on the vectors:
    per-vector L2 norm and peak component magnitude, with
    percentile-band outlier flags (norm below p01 / above p99, max-abs
    above p99) — the cheap detector for the classic embedding-pipeline
    failures: zero/near-zero vectors from empty inputs, exploded norms
    from a bad batch, mixed normalized/unnormalized shards (norm
    flags), and collapsed/spiky vectors whose mass concentrates in one
    component (spike flag).  Each failure silently poisons cosine ANN
    and k-means downstream.  On a HEALTHY normalized corpus — like this
    testdata, norm ≡ 1.0 — the norm flags are all zero by construction
    and the spike flag carries the signal; that asymmetry is the point
    of running the check.

    Engine-exactness: the norm is a fold in ARRAY ORDER (the `_DOT_FOLD`
    discipline — both engines run the same IEEE add chain) and max-abs
    is order-independent, both rounded to 1e-6; the thresholds are exact
    interpolated percentiles of those rounded values (`F.percentile` ≡
    `quantile_cont`, the `value_percentiles` convention), so the flags
    hash-match.

    Scale shape: both profiles compute scan-side (one fold + one max per
    row, embedding column pruned immediately after); the persisted
    (vec_id, norm, max_abs) table feeds the three-scalar percentile
    aggregate, which broadcasts back as a 1-row cross join — no global
    sort, no single-partition window, nothing driver-side beyond 3
    scalars."""
    from ..caching import materialized

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    n2 = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    max_abs = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    t = emb.select(
        "vec_id",
        F.round(F.sqrt(n2), 6).alias("l2_norm"),
        F.round(max_abs, 6).alias("max_abs"),
    ).persist()
    s = t.agg(
        F.round(F.percentile("l2_norm", F.lit(0.01)), 6).alias("norm_p01"),
        F.round(F.percentile("l2_norm", F.lit(0.99)), 6).alias("norm_p99"),
        F.round(F.percentile("max_abs", F.lit(0.99)), 6).alias("spike_p99"),
    )
    result = t.crossJoin(F.broadcast(s)).select(
        "vec_id",
        "l2_norm",
        "max_abs",
        (F.col("l2_norm") < F.col("norm_p01")).cast("int").alias("is_low"),
        (F.col("l2_norm") > F.col("norm_p99")).cast("int").alias("is_high"),
        (F.col("max_abs") > F.col("spike_p99")).cast("int").alias("is_spiky"),
    )
    return materialized(result, t)
