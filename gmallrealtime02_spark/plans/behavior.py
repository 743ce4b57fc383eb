"""User-behavior / time-series / graph analytics beyond the reference
surface: rolling-window distinct counts, per-key timeline gap filling,
and triangle counting on the item co-view graph.

No reference citation exists for these (the reference —
gmallrealtime/src/main/scala — stops at daily DAU counts pushed to ES);
they are the standard product-analytics ops a warehouse at 100 TB needs,
each expressed in the shape that survives scale:

- ``rolling_active_users``: COUNT(DISTINCT) OVER a trailing date range is
  not executable as a window function in Spark (and a naive self-join is
  O(days * corpus)); the scalable form is the bounded explode of each
  (user, day) pair into the W target days it contributes to.
- ``gap_fill``: per-key calendar densification + as-of carry-forward,
  the missing-reading interpolation shape for sensor/engagement data.
- ``triangle_count``: canonical-orientation wedge join — never
  enumerates per-node neighbor cross products beyond oriented wedges.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..caching import materialized
from ..functions.numeric import ratio_micro, ratio_micro_sql
from ..sources import load_table
from ..sources.tables import ensure_parallelism
from .registry import register

ROLL_DAYS = 7  # trailing-window width (days)


@register(
    "rolling_active_users",
    oracle=f"""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT strftime(d.day, '%Y-%m-%d') AS dt,
           count(DISTINCT u.user_id) AS active_users
    FROM days d
    JOIN ud u ON u.day BETWEEN d.day - {ROLL_DAYS - 1} AND d.day
    GROUP BY 1
    """,
    tags=("window", "distinct", "timeseries"),
)
def rolling_active_users(spark, sf_dir):
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ud = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", ROLL_DAYS - 1))
        ).alias("day"),
        "user_id",
    ).distinct()
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.count("*").alias("active_users"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("dt"), "active_users"
        )
    )


rolling_active_users.__doc__ = """Trailing {w}-day distinct active users per day (the WAU/MAU
family).  Spark has no COUNT(DISTINCT) OVER (RANGE ...), and the
join form the oracle uses multiplies the fact table by the number of
report days.  The scalable shape is contribution explode: each
DISTINCT (user, day) pair fans out to the ≤{w} later days it keeps
the user "active" for — a BOUNDED blow-up factor of {w}, independent
of corpus size — then one distinct on (target_day, user).

Exchanges: one for the (user, day) distinct (map-side partials), one
for the post-explode distinct; both keys are user-sized, never
event-sized.  Report days are restricted to days that actually occur
(the join with observed days is a broadcast of O(days) rows).
""".format(w=ROLL_DAYS)


@register(
    "gap_fill",
    oracle="""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               -- coalesce: a day whose purchases all carry NULL value is
               -- still an OBSERVATION (total 0) — leaving it NULL made
               -- the Spark carry (last ignorenulls skips it) and the
               -- ASOF oracle (picks it) diverge
               CAST(coalesce(sum(CAST(value AS DECIMAL(18,6))), 0) AS DOUBLE)
                   AS day_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
             FROM ud GROUP BY user_id),
    cal AS (SELECT s.user_id, CAST(t.day AS DATE) AS day
            FROM span s, unnest(generate_series(s.lo, s.hi,
                                                INTERVAL 1 DAY)) AS t(day))
    SELECT c.user_id AS user_id, strftime(c.day, '%Y-%m-%d') AS dt,
           coalesce(u.day_value IS NOT NULL, FALSE) AS observed,
           f.day_value AS filled_value
    FROM cal c
    LEFT JOIN ud u ON u.user_id = c.user_id AND u.day = c.day
    ASOF LEFT JOIN ud f ON f.user_id = c.user_id AND c.day >= f.day
    """,
    tags=("timeseries", "window", "gap-fill"),
)
def gap_fill(spark, sf_dir):
    """Per-user daily purchase timeline densification: every user gets a
    row for EVERY calendar day between their first and last purchase;
    days without activity carry the last observed daily total forward
    (sensor/engagement gap-fill semantics).

    Scale shape: the calendar explode is per-key and bounded by each
    key's own date span (never min(all) .. max(all), which would explode
    cold keys); the carry-forward is `last(ignorenulls)` over a
    user-partitioned window.  Exactly TWO exchanges (gated): the
    (user, day) day-sum aggregate, then one user_id exchange shared by
    the span aggregate, the densify join, and the carry-forward window.
    Day sums use exact decimal partials so the filled values are
    partition-order independent.
    """
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ud = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.coalesce(
                F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0)
            )
            .cast("double")
            .alias("day_value")
        )
    )
    span = ud.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    cal = span.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    joined = cal.join(ud, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("dt"),
        F.col("day_value").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


TRI_TOP = 20


@register(
    "triangle_count",
    oracle=f"""
    WITH ui AS (SELECT DISTINCT user_id,
                       CAST(props->>'$.k' AS INTEGER) AS item
                FROM events WHERE event_type = 'view'),
    e AS (SELECT DISTINCT a.item AS lo, b.item AS hi
          FROM ui a JOIN ui b
            ON a.user_id = b.user_id AND a.item < b.item),
    tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM e e1
            JOIN e e2 ON e2.lo = e1.hi
            JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
    x AS (SELECT a AS item FROM tri UNION ALL
          SELECT b FROM tri UNION ALL
          SELECT c FROM tri)
    SELECT item, count(*) AS n_triangles
    FROM x GROUP BY item
    ORDER BY n_triangles DESC, item
    LIMIT {TRI_TOP}
    """,
    tags=("graph", "triangle", "join"),
)
def triangle_count(spark, sf_dir):
    result, caches = _triangle_count_plan(spark, sf_dir)
    return materialized(result, *caches)


triangle_count.__doc__ = """Top-{k} items by triangle participation in the co-view graph
(community-density signal; triangles are the unit of clustering
coefficient).  An edge {{a,b}} exists when some user viewed both.

Scale shape: edges are canonically oriented lo<hi once (halves the
edge list and makes each triangle countable exactly once as
a<b<c), then ONE wedge join (edges ⋈ edges on the middle vertex)
followed by a hash semi-probe of the closing edge — never a
per-node neighborhood cross product materialized beyond oriented
wedges.  Production adds degree-ordering to bound hub wedges
(orient toward higher degree, O(m^1.5) total wedges); id-ordering
keeps the oracle exact here and the participation counts are
orientation-invariant either way.  The per-user co-view fan-out is
bounded by the per-user distinct-item slice, capped upstream for
crawler-grade users (same cap note as coview_pagerank).
""".format(k=TRI_TOP)


def _triangle_count_plan(spark, sf_dir):
    """Lazy plan builder — what the plan-shape gate inspects; the
    registered wrapper materializes and releases the edge cache."""
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ui = (
        e.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    b = ui.select(F.col("user_id").alias("uid"), F.col("item").alias("item_b"))
    edges = (
        ui.join(b, (ui.user_id == b.uid) & (ui.item < b.item_b))
        .select(F.col("item").alias("lo"), F.col("item_b").alias("hi"))
        .distinct()
        .persist()
    )
    e1 = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = edges.select(F.col("lo").alias("b2"), F.col("hi").alias("c"))
    wedges = e1.join(e2, e1.b == e2.b2).select("a", "b", "c")
    closing = edges.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    part = tri.select(F.explode(F.array("a", "b", "c")).alias("item"))
    out = (
        part.groupBy("item")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "item")
        .limit(TRI_TOP)
    )
    return out, (edges,)


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------

RFM_LABEL_SQL = """CASE
        WHEN r_q >= 4 AND f_q >= 4 AND m_q >= 4 THEN 'champion'
        WHEN r_q <= 2 AND m_q >= 4 THEN 'at_risk'
        WHEN f_q >= 4 THEN 'loyal'
        WHEN r_q >= 4 THEN 'recent'
        ELSE 'regular' END"""


@register(
    "rfm_segmentation",
    oracle=f"""
    WITH rfm AS (
        SELECT o_custkey AS user_id, count(*) AS frequency,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary,
               max(CAST(o_orderdate AS DATE)) AS last_day
        FROM orders GROUP BY o_custkey
    ), mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders)
    SELECT user_id, segment, recency_days, frequency, monetary,
           r_q, f_q, m_q, {RFM_LABEL_SQL} AS label
    FROM (
        SELECT r.user_id, c.c_mktsegment AS segment,
               date_diff('day', r.last_day, m.max_day) AS recency_days,
               r.frequency, r.monetary,
               ntile(5) OVER (PARTITION BY c.c_mktsegment
                   ORDER BY date_diff('day', r.last_day, m.max_day) DESC,
                            r.user_id) AS r_q,
               ntile(5) OVER (PARTITION BY c.c_mktsegment
                   ORDER BY r.frequency ASC, r.user_id) AS f_q,
               ntile(5) OVER (PARTITION BY c.c_mktsegment
                   ORDER BY r.monetary ASC, r.user_id) AS m_q
        FROM rfm r JOIN customer c ON c.c_custkey = r.user_id, mx m
    )
    """,
    tags=("behavior", "segmentation", "window"),
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation — recency / frequency / monetary
    quintiles per market segment, with the classic label rules
    (champion / at_risk / loyal / recent / regular).

    Scale shape: orders collapse to one row per customer FIRST (one
    custkey exchange with map-side partials; monetary is an exact
    decimal sum), then join the customer dim on the same key.  The
    corpus max date is a 1-row broadcast scalar.  All three ntile
    windows share ONE segment exchange (same partitioning, different
    orderings ⇒ three in-partition sorts, no extra shuffle) — and each
    segment ranks independently, so no global sort exists, mirroring
    `ccnet_quality_buckets`'s per-language discipline.  Orderings carry
    a user_id tie-break, so every quintile is deterministic in both
    engines."""
    from ..operators.aggregates import dsum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rfm = o.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.count("*").alias("frequency"),
        dsum("o_totalprice", 2).alias("monetary"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
    )
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("max_day"))
    base = (
        rfm.join(c, rfm.user_id == c.c_custkey)
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            F.datediff("max_day", "last_day").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    seg = Window.partitionBy("segment")
    r_q = F.ntile(5).over(
        seg.orderBy(F.col("recency_days").desc(), F.col("user_id"))
    )
    f_q = F.ntile(5).over(seg.orderBy(F.col("frequency").asc(), F.col("user_id")))
    m_q = F.ntile(5).over(seg.orderBy(F.col("monetary").asc(), F.col("user_id")))
    ranked = base.select(
        "user_id", "segment", "recency_days", "frequency", "monetary",
        r_q.alias("r_q"), f_q.alias("f_q"), m_q.alias("m_q"),
    )
    return ranked.withColumn(
        "label",
        F.when(
            (F.col("r_q") >= 4) & (F.col("f_q") >= 4) & (F.col("m_q") >= 4),
            "champion",
        )
        .when((F.col("r_q") <= 2) & (F.col("m_q") >= 4), "at_risk")
        .when(F.col("f_q") >= 4, "loyal")
        .when(F.col("r_q") >= 4, "recent")
        .otherwise("regular"),
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix (first-active-day cohorts × age)
# ---------------------------------------------------------------------------


@register(
    "retention_cohorts",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS dt, user_id FROM events
    ),
    c AS (
        SELECT dt, user_id,
               min(dt) OVER (PARTITION BY user_id) AS cohort_dt
        FROM ud
    )
    SELECT cohort_dt,
           CAST(CAST(dt AS DATE) - CAST(cohort_dt AS DATE) AS BIGINT)
               AS age_days,
           count(*) AS active_users
    FROM c GROUP BY cohort_dt, age_days
    """,
    tags=("retention", "cohort", "window", "behavior"),
)
def retention_cohorts(spark, sf_dir):
    """Classic cohort-retention matrix: users bucketed by first-active
    day, cell (cohort_dt, age_days) = distinct users from that cohort
    active age_days later (age 0 row = cohort size; divide client-side
    for rates) — the full-history generalization of ``dau_retention``'s
    day-over-day count.

    Scale shape: the event log collapses to distinct (day, user) pairs
    first (one exchange, |users|×|days| upper bound), the cohort day is
    a min() window on the SAME user_id partitioning (no self-join of
    the log, no second corpus pass), and the final matrix aggregate
    shuffles only (cohort, age) keys with map-side partials — the
    matrix itself is |days|² cells at most."""
    e = load_table(spark, sf_dir, "events")
    ud = (
        ensure_parallelism(e, by=("user_id",))
        .select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id")
    c = ud.withColumn("cohort_dt", F.min("dt").over(w))
    return (
        c.select(
            "cohort_dt",
            F.datediff(F.to_date("dt"), F.to_date("cohort_dt"))
            .cast("bigint")
            .alias("age_days"),
        )
        .groupBy("cohort_dt", "age_days")
        .agg(F.count("*").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Last-touch purchase attribution
# ---------------------------------------------------------------------------


@register(
    "attribution_last_touch",
    oracle="""
    WITH m AS (
        SELECT user_id, event_id, ts, event_type, value,
               CASE WHEN event_type <> 'purchase' THEN event_type END AS src,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS kind_ord
        FROM events
    ),
    c AS (
        SELECT user_id, event_id, ts, event_type, value,
               last_value(src IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, kind_ord, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS touch
        FROM m
    )
    SELECT coalesce(touch, 'direct') AS attributed_to,
           count(*) AS purchases,
           CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM c WHERE event_type = 'purchase'
    GROUP BY attributed_to
    """,
    tags=("attribution", "asof", "behavior", "window"),
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch purchase attribution: every purchase credits the user's
    most recent NON-purchase event type at-or-before it ('direct' when
    none precedes) — purchases and revenue rolled up per attributed
    channel.  The marketing-analytics twin of ``asof_prev_view``:
    same carry-forward rewrite, different carried payload.

    Scale shape: ONE user_id exchange — the tag/carry-forward window
    runs per user in a single pass over the log (state-first tie order
    so a touch at the purchase's exact timestamp attributes), and the
    rollup shuffles only |event_type| keys with map-side partials.
    Revenue sums round-2 DECIMALs, partitioning-invariant."""
    e = ensure_parallelism(load_table(spark, sf_dir, "events"), by=("user_id",))
    m = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.when(F.col("event_type") != "purchase", F.col("event_type")).alias(
            "src"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "kind_ord"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind_ord", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = m.withColumn("touch", F.last("src", ignorenulls=True).over(w))
    return (
        c.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("direct")).alias("attributed_to"))
        .agg(
            F.count("*").alias("purchases"),
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew profiler (operational: where does salting pay off?)
# ---------------------------------------------------------------------------

SKEW_TOP = 10


@register(
    "key_skew_profile",
    oracle=f"""
    WITH k AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    t AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM k)
    SELECT user_id, cnt,
           CAST({ratio_micro_sql("cnt", "t.total")} AS DOUBLE) / 1000000
               AS share,
           CAST({ratio_micro_sql("cnt * t.n_keys", "t.total")} AS DOUBLE)
               / 1000000 AS skew_factor
    FROM k CROSS JOIN t
    ORDER BY cnt DESC, user_id ASC LIMIT {SKEW_TOP}
    """,
    tags=("skew", "profiling", "operational"),
)
def key_skew_profile(spark, sf_dir):
    result, caches = _key_skew_profile_plan(spark, sf_dir)
    return materialized(result, *caches)


key_skew_profile.__doc__ = """Join-key skew profiler for the events.user_id key: the top-{k}
heaviest keys with their share of all rows and skew factor
(cnt / mean-per-key) — the measurement that decides WHERE
``operators.skew.salted_join`` pays for itself (a key with
skew_factor ≫ partition count stalls its reducer; salting splits
it).  Measure, don't guess, applied to the engine's own scale
strategy.

Scale shape: one user_id-keyed count aggregate with map-side
partials, a two-scalar total/count reduce over the per-key counts
(broadcast back as a 1-row cross join), and a distributed
TakeOrdered for the top-{k} — no global sort, nothing driver-side
beyond {k} rows.  The per-key count table persists so the scalar
reduce and the ranking share one corpus scan; released after
materialization.""".format(k=SKEW_TOP)


def _key_skew_profile_plan(spark, sf_dir):
    """Lazy (result, caches) pair — the plan gate inspects this; the
    registered fn materializes and releases the cache."""
    e = load_table(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(F.count("*").alias("cnt")).persist()
    t = k.agg(F.sum("cnt").alias("total"), F.count("*").alias("n_keys"))
    result = (
        k.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "cnt",
            (
                ratio_micro(F.col("cnt"), F.col("total")).cast("double")
                / 1000000
            ).alias("share"),
            (
                ratio_micro(
                    F.col("cnt") * F.col("n_keys"), F.col("total")
                ).cast("double")
                / 1000000
            ).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        .limit(SKEW_TOP)
    )
    return result, (k,)


# ---------------------------------------------------------------------------
# Market-basket association rules (pairwise support / confidence / lift)
# ---------------------------------------------------------------------------

BASKET_TOP = 20


@register(
    "basket_affinity",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
    ic AS (SELECT l_partkey, count(*) AS item_cnt FROM b GROUP BY l_partkey),
    p AS (
        SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
               count(*) AS pair_count
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY part_a, part_b
    ),
    top AS (
        SELECT * FROM p
        ORDER BY pair_count DESC, part_a, part_b LIMIT {BASKET_TOP}
    )
    SELECT t.part_a, t.part_b, t.pair_count,
           CAST({ratio_micro_sql("t.pair_count", "n.n_orders")} AS DOUBLE)
               / 1000000 AS support,
           CAST({ratio_micro_sql("t.pair_count", "ia.item_cnt")} AS DOUBLE)
               / 1000000 AS confidence_a_to_b,
           CAST({ratio_micro_sql(
               "t.pair_count * n.n_orders", "ia.item_cnt * ib.item_cnt")}
                AS DOUBLE) / 1000000 AS lift
    FROM top t
    JOIN ic ia ON ia.l_partkey = t.part_a
    JOIN ic ib ON ib.l_partkey = t.part_b
    CROSS JOIN n
    """,
    tags=("basket", "association-rules", "retail", "behavior"),
)
def basket_affinity(spark, sf_dir):
    result, caches = _basket_affinity_plan(spark, sf_dir)
    return materialized(result, *caches)


basket_affinity.__doc__ = """Market-basket association rules over order baskets: the top-{k}
part pairs most often bought together, with support
(pair/orders), confidence (pair/count(a)) and lift
(support / (supp(a)·supp(b))) — the classic co-purchase
recommendation signal, at the ITEM level where ``coview_pagerank``
ranks the user-level co-view graph.

Scale shape: baskets collapse to distinct (order, part) first; the
pair self-join is an equi-join ON l_orderkey, so pairs only ever
materialize WITHIN a basket — the blowup is Σ(basket choose 2),
bounded by per-order basket size (≤13 here; a production cap drops
crawler-sized baskets the same way coview caps users).  Pair counts
aggregate with map-side partials on (a, b) keys; the top-{k} is a
distributed TakeOrdered; and the support/lift DENOMINATORS join
AFTER the top-{k} cut — {k} broadcast-probe rows against the item
count table, never a |parts|-sized broadcast.""".format(k=BASKET_TOP)


def _basket_affinity_plan(spark, sf_dir):
    """Lazy (result, caches) pair — the plan gate inspects this; the
    registered fn materializes and releases the cache."""
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem"), by=("l_orderkey",)
    )
    b = li.select("l_orderkey", "l_partkey").distinct().persist()
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ic = b.groupBy("l_partkey").agg(F.count("*").alias("item_cnt"))
    a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    c = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    top = (
        a.join(c, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "part_a", "part_b")
        .limit(BASKET_TOP)
    )
    ia = ic.select(F.col("l_partkey").alias("part_a"), F.col("item_cnt").alias("cnt_a"))
    ib = ic.select(F.col("l_partkey").alias("part_b"), F.col("item_cnt").alias("cnt_b"))
    result = (
        F.broadcast(top)
        .join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "pair_count",
            (
                ratio_micro(F.col("pair_count"), F.col("n_orders")).cast(
                    "double"
                )
                / 1000000
            ).alias("support"),
            (
                ratio_micro(F.col("pair_count"), F.col("cnt_a")).cast(
                    "double"
                )
                / 1000000
            ).alias("confidence_a_to_b"),
            (
                ratio_micro(
                    F.col("pair_count") * F.col("n_orders"),
                    F.col("cnt_a") * F.col("cnt_b"),
                ).cast("double")
                / 1000000
            ).alias("lift"),
        )
    )
    return result, (b,)


# ---------------------------------------------------------------------------
# Weekly seasonality profile
# ---------------------------------------------------------------------------


@register(
    "seasonality_profile",
    oracle=f"""
    WITH d AS (
        SELECT event_type, strftime(ts, '%A') AS dow,
               count(*) AS n,
               sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS sv
        FROM events GROUP BY event_type, dow
    )
    SELECT event_type, dow, n,
           CAST({ratio_micro_sql("CAST(sv * 100 AS BIGINT)", "100 * n")}
                AS DOUBLE) / 1000000 AS avg_value,
           CAST({ratio_micro_sql(
               "n", "sum(n) OVER (PARTITION BY event_type)")}
                AS DOUBLE) / 1000000 AS share
    FROM d
    """,
    tags=("seasonality", "time-series", "behavior"),
)
def seasonality_profile(spark, sf_dir):
    """Weekly seasonality per event type: count, decimal-exact average
    value, and within-type share for each (event_type, weekday) cell —
    the day-of-week profile capacity planning and anomaly baselines
    start from (``anomaly_zscore``'s trailing window catches spikes;
    this catches the Monday-vs-Sunday structure it must not flag).

    Scale shape: one aggregate to |event_type|×7 cells with map-side
    partials (sums over round-2 DECIMALs, partitioning-invariant), then
    the share is a window sum OVER the 7-row event_type partitions of
    the tiny cell table — nothing corpus-scale past the first exchange,
    and weekday comes from the locale-independent pattern day name so
    both engines bucket identically."""
    e = load_table(spark, sf_dir, "events")
    d = (
        e.groupBy(
            "event_type", F.date_format("ts", "EEEE").alias("dow")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("sv"),
        )
    )
    w = Window.partitionBy("event_type")
    return d.select(
        "event_type",
        "dow",
        "n",
        (
            ratio_micro(
                (F.col("sv") * 100).cast("long"), F.col("n") * 100
            ).cast("double")
            / 1000000
        ).alias("avg_value"),
        (
            ratio_micro(F.col("n"), F.sum("n").over(w)).cast("double")
            / 1000000
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Per-type daily trend line (closed-form OLS on exact power sums)
# ---------------------------------------------------------------------------


@register(
    "daily_trend",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS y
        FROM events GROUP BY event_type, day
    ),
    x AS (
        SELECT event_type,
               CAST(day - min(day) OVER (PARTITION BY event_type) AS BIGINT)
                   AS x,
               y
        FROM d
    ),
    s AS (
        SELECT event_type, count(*) AS n,
               sum(x) AS sx, sum(x * x) AS sxx,
               sum(y) AS sy,
               sum(CAST(x AS DECIMAL(18,0)) * y) AS sxy,
               sum(y * y) AS syy
        FROM x GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0), 6)
               AS slope,
           round((CAST(sy AS DOUBLE)
                  - (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                    / nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0)
                    * sx) / n, 6) AS intercept,
           round(((n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                  * (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE)))
                 / nullif((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                          * (n * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0), 6)
               AS r2
    FROM s
    """,
    tags=("stats", "regression", "trend", "time-series"),
)
def daily_trend(spark, sf_dir):
    """Closed-form OLS trend line per event type: slope / intercept / R²
    of the daily value total regressed on day index — the in-engine
    "is this metric growing?" primitive (`ewma_daily_value` smooths,
    `anomaly_zscore` flags; this quantifies direction with a fit
    quality).

    Scale shape: one (event_type, day) aggregate with decimal map-side
    partials collapses the corpus to |types|×|days| cells; the day
    index is a min() window over that tiny table's type partitions; the
    five OLS power sums (`quantity_price_corr` discipline — exact
    BIGINT/DECIMAL partials, double math ONCE on the totals) reduce per
    type.  Degenerate fits (single day, constant series) yield null via
    nullif, identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("y"))
    w = Window.partitionBy("event_type")
    x = d.select(
        "event_type",
        F.datediff("day", F.min("day").over(w)).cast("bigint").alias("x"),
        "y",
    )
    s = x.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sxd, sxxd = F.col("sx").cast("double"), F.col("sxx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd, syyd = F.col("sxy").cast("double"), F.col("syy").cast("double")
    num = n * sxyd - F.col("sx") * syd
    den = F.nullif(n.cast("double") * sxxd - sxd * F.col("sx"), F.lit(0.0))
    slope = num / den
    den2 = F.nullif(
        (n.cast("double") * sxxd - sxd * F.col("sx"))
        * (n * syyd - syd * syd),
        F.lit(0.0),
    )
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round((syd - slope * F.col("sx")) / n, 6).alias("intercept"),
        F.round(num * num / den2, 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# A/B-test readout (two-proportion z-test on exact counts)
# ---------------------------------------------------------------------------


@register(
    "ab_test_zscore",
    oracle=f"""
    WITH u AS (
        SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
               max(CASE WHEN event_type = 'purchase' AND value >= 100
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT variant, count(*) AS users,
               CAST(sum(converted) AS BIGINT) AS conversions
        FROM u GROUP BY variant
    ),
    w AS (
        SELECT max(CASE WHEN variant = 0 THEN users END) AS n_a,
               max(CASE WHEN variant = 0 THEN conversions END) AS c_a,
               max(CASE WHEN variant = 1 THEN users END) AS n_b,
               max(CASE WHEN variant = 1 THEN conversions END) AS c_b
        FROM v
    )
    SELECT n_a, c_a,
           CAST({ratio_micro_sql("c_a", "n_a")} AS DOUBLE) / 1000000
               AS rate_a,
           n_b, c_b,
           CAST({ratio_micro_sql("c_b", "n_b")} AS DOUBLE) / 1000000
               AS rate_b,
           round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                 / nullif(sqrt(
                       (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                       * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                       * (1.0 / n_a + 1.0 / n_b)), 0), 6) AS zscore
    FROM w
    """,
    tags=("ab-test", "stats", "behavior"),
)
def ab_test_zscore(spark, sf_dir):
    """A/B-test readout: users split into two deterministic variants
    (user_id parity — the stand-in for a real assignment column),
    per-variant high-value-conversion rates (a purchase of value ≥ 100
    — a definition that actually splits this fixture's users) and the pooled
    two-proportion z-score (B minus A) — the standard experiment
    significance readout, computed in-engine from exact counts so the
    number is identical on every run and engine (a sampled readout
    would wobble run to run).

    Scale shape: the corpus collapses at a per-user max() aggregate
    (one user_id exchange, map-side partials), then |variants| rows
    reduce to ONE readout row — double math happens once on four exact
    integers.  Degenerate splits (a variant with zero users never
    occurs by construction; zero pooled variance) yield null via
    nullif."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    v = u.groupBy("variant").agg(
        F.count("*").alias("users"),
        F.sum("converted").cast("bigint").alias("conversions"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("conversions"))).alias("c_a"),
        F.max(F.when(F.col("variant") == 1, F.col("users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("conversions"))).alias("c_b"),
    )
    na, ca = F.col("n_a"), F.col("c_a")
    nb, cb = F.col("n_b"), F.col("c_b")
    pool = (ca + cb).cast("double") / (na + nb)
    se = F.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    return w.select(
        "n_a",
        "c_a",
        (ratio_micro(ca, na).cast("double") / 1000000).alias("rate_a"),
        "n_b",
        "c_b",
        (ratio_micro(cb, nb).cast("double") / 1000000).alias("rate_b"),
        F.round(
            (cb.cast("double") / nb - ca.cast("double") / na)
            / F.nullif(se, F.lit(0.0)),
            6,
        ).alias("zscore"),
    )


# ---------------------------------------------------------------------------
# Time-to-convert latency distribution (view → purchase)
# ---------------------------------------------------------------------------


@register(
    "time_to_convert",
    oracle="""
    WITH p AS (
        SELECT p.event_id, p.user_id, p.ts, v.ts AS prev_view_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    ),
    d AS (
        SELECT CAST(date_diff('microsecond', prev_view_ts, ts) AS BIGINT)
                   // 1000000 AS delta_s
        FROM p WHERE prev_view_ts IS NOT NULL
    )
    SELECT count(*) AS n_conversions,
           CAST(min(delta_s) AS BIGINT) AS min_s,
           round(quantile_cont(delta_s, 0.5), 6) AS p50_s,
           round(quantile_cont(delta_s, 0.9), 6) AS p90_s,
           CAST(max(delta_s) AS BIGINT) AS max_s
    FROM d
    """,
    tags=("attribution", "asof", "percentile", "behavior"),
)
def time_to_convert(spark, sf_dir):
    """View-to-purchase latency distribution: for every purchase with a
    preceding view by the same user (the ``asof_prev_view`` match),
    the whole-second delay, summarized as count / min / exact
    interpolated p50 & p90 / max — the conversion-lag readout that
    sizes attribution windows (a p90 of hours says a 30-minute
    last-touch window undercounts).

    Scale shape: the as-of match is the carry-forward rewrite (one
    user_id exchange, no range join); deltas are exact BIGINT seconds
    so the sort-based percentile is engine-identical; the final
    summary is one scalar aggregate (`value_percentiles` is the
    per-group form; ``histogram_quantiles`` the mergeable-sketch form
    this validates at scale)."""
    from ..operators.windows import asof_prev_event

    e = load_table(spark, sf_dir, "events")
    matched = asof_prev_event(e, "purchase", "view")
    d = matched.filter(F.col("prev_src_ts").isNotNull()).select(
        # exact micros then floor-div: engines disagree on whether a
        # 'second' diff truncates elapsed time or counts boundary
        # crossings when sub-second components differ
        (
            F.timestamp_diff("MICROSECOND", F.col("prev_src_ts"), F.col("ts"))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("delta_s")
    )
    return d.agg(
        F.count("*").alias("n_conversions"),
        F.min("delta_s").cast("bigint").alias("min_s"),
        F.round(F.percentile("delta_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("delta_s", F.lit(0.9)), 6).alias("p90_s"),
        F.max("delta_s").cast("bigint").alias("max_s"),
    )


# ---------------------------------------------------------------------------
# Connected components on the co-view graph (first-class CC primitive)
# ---------------------------------------------------------------------------


@register(
    "coview_components",
    oracle="""
    WITH RECURSIVE
    ui AS (SELECT DISTINCT user_id,
                  CAST(props->>'$.k' AS INTEGER) AS item
           FROM events WHERE event_type = 'view'),
    e AS (SELECT DISTINCT a.item AS lo, b.item AS hi
          FROM ui a JOIN ui b
            ON a.user_id = b.user_id AND a.item < b.item),
    ed AS (SELECT lo AS src, hi AS dst FROM e
           UNION SELECT hi, lo FROM e),
    nodes AS (SELECT DISTINCT src AS item FROM ed),
    reach(item, lbl) AS (
        SELECT item, item FROM nodes
        UNION
        SELECT ed.src, r.lbl FROM reach r JOIN ed ON ed.dst = r.item
    ),
    comp AS (SELECT item, min(lbl) AS component FROM reach GROUP BY item),
    sz AS (SELECT component, count(*) AS comp_size
           FROM comp GROUP BY component)
    SELECT c.item AS item, c.component AS component,
           CAST(sz.comp_size AS BIGINT) AS comp_size
    FROM comp c JOIN sz USING (component)
    """,
    tags=("graph", "components", "iterative", "dedup"),
)
def coview_components(spark, sf_dir):
    """Connected components of the item co-view graph, surfaced as a
    first-class query: each item with its component id (the minimum
    reachable item id) and its component's size — the same
    min-label-propagation primitive the dedup family uses internally
    (``similarity.connected_components`` powers dedup_canonical /
    dedup_keep_best / near_dup_cluster_sizes), here applied to the
    behavioral graph where it segments the catalog into co-browse
    clusters.

    Engine-exactness: labels are min-ids — a pure function of the edge
    set — so even the ITERATIVE fixpoint is hash-oracled: the DuckDB
    side computes the same fixpoint as a recursive CTE (min reachable
    label via transitive closure), the first recursive-CTE oracle in
    the registry.

    Scale shape: Spark iterates min-label propagation — one (vertex,
    label) join + partial-agg min per round, O(component diameter)
    rounds, lineage truncated per round via localCheckpoint — which is
    the 100 TB shape (the oracle's transitive closure materializes
    O(sum |C|^2) reach pairs and is oracle-only).  Per-user co-view
    fan-out is bounded by the per-user distinct-item slice (same cap
    note as coview_pagerank/triangle_count)."""
    from ..functions.similarity import connected_components

    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ui = (
        e.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    b = ui.select(F.col("user_id").alias("uid"), F.col("item").alias("item_b"))
    pairs = (
        ui.join(b, (ui.user_id == b.uid) & (ui.item < b.item_b))
        .select(F.col("item").alias("doc_a"), F.col("item_b").alias("doc_b"))
        .distinct()
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("comp_size"))
    return (
        comp.select(F.col("doc_id").alias("item"), "component")
        .join(F.broadcast(sizes), "component")
        .select("item", "component", "comp_size")
    )


# ---------------------------------------------------------------------------
# Single-source BFS depth on the co-view graph
# ---------------------------------------------------------------------------

BFS_MAX_DEPTH = 64  # oracle recursion guard; >> any co-view diameter


@register(
    "coview_bfs_depth",
    oracle=f"""
    WITH RECURSIVE
    ui AS (SELECT DISTINCT user_id,
                  CAST(props->>'$.k' AS INTEGER) AS item
           FROM events WHERE event_type = 'view'),
    e AS (SELECT DISTINCT a.item AS lo, b.item AS hi
          FROM ui a JOIN ui b
            ON a.user_id = b.user_id AND a.item < b.item),
    ed AS (SELECT lo AS src, hi AS dst FROM e
           UNION SELECT hi, lo FROM e),
    s AS (SELECT min(src) AS root FROM ed),
    walk(item, d) AS (
        SELECT root, 0 FROM s
        UNION
        SELECT ed.dst, w.d + 1
        FROM walk w JOIN ed ON ed.src = w.item
        WHERE w.d < {{BFS_MAX_DEPTH}}
    )
    SELECT item, CAST(min(d) AS BIGINT) AS depth
    FROM walk GROUP BY item
    """.format(BFS_MAX_DEPTH=BFS_MAX_DEPTH),
    tags=("graph", "bfs", "iterative"),
)
def coview_bfs_depth(spark, sf_dir):
    """Single-source BFS depth over the co-view graph from the minimum
    item id — the graph-DISTANCE primitive beside
    ``coview_components``'s reachability (recommendation radius, "how
    many co-browse hops from the anchor product"), and the second
    iterative fixpoint carrying a full hash oracle (DuckDB recursive
    CTE: min depth over the depth-guarded walk closure).

    Scale shape: classic frontier BFS — each round joins ONLY the
    current frontier (not all visited nodes) against the edge table and
    anti-joins the visited set, so a round's cost is O(frontier
    out-degree); rounds = eccentricity of the root (tiny on co-view
    graphs); lineage truncated per round via localCheckpoint, visited
    set persisted.  The oracle's closure enumerates (item, depth ≤ cap)
    pairs and is oracle-only — the Spark loop never materializes
    superseded depths."""
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ui = (
        e.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    b = ui.select(F.col("user_id").alias("uid"), F.col("item").alias("item_b"))
    und = (
        ui.join(b, (ui.user_id == b.uid) & (ui.item < b.item_b))
        .select(F.col("item").alias("lo"), F.col("item_b").alias("hi"))
        .distinct()
    )
    edges = (
        und.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        .unionByName(
            und.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
        )
        .distinct()
        .persist()
    )
    root = edges.agg(F.min("src")).collect()[0][0]
    if root is None:
        # no user viewed 2+ distinct items -> empty edge set; the oracle's
        # recursive CTE likewise yields no rows
        edges.unpersist()
        return spark.createDataFrame([], "item int, depth long")
    visited = (
        spark.createDataFrame([(int(root), 0)], "item int, depth long")
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for depth in range(1, BFS_MAX_DEPTH + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("item").alias("src")), "src"
            )
            .select(F.col("dst").alias("item"))
            .distinct()
            .join(visited.select("item"), "item", "left_anti")
            .withColumn("depth", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return visited


COVIEW_SIM_MAX_USER_ITEMS = 32  # heavy-user gate: power users view
# everything and contribute O(items²) pairs of pure noise — the standard
# co-occurrence-mining cap (mirrored exactly in the oracle, so the gate
# is part of the op's semantics, not a sampling shortcut)
COVIEW_SIM_MIN_CO = 2  # pairs must co-occur for 2+ users to surface


@register(
    "coview_item_similarity",
    oracle=f"""
    WITH ui0 AS (
        SELECT DISTINCT user_id, CAST(props->>'$.k' AS INTEGER) AS item
        FROM events WHERE event_type = 'view'
    ),
    uc AS (SELECT user_id FROM ui0 GROUP BY user_id
           HAVING count(*) <= {COVIEW_SIM_MAX_USER_ITEMS}),
    ui AS (SELECT ui0.user_id, ui0.item FROM ui0 JOIN uc USING (user_id)),
    co AS (
        SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
        FROM ui a JOIN ui b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2
    ),
    deg AS (SELECT item, count(*) AS n_u FROM ui GROUP BY item)
    SELECT item_a, item_b, n_co,
           da.n_u AS users_a, db.n_u AS users_b,
           CAST({ratio_micro_sql(
               "n_co", "da.n_u + db.n_u - n_co"
           )} AS DOUBLE) / 1000000 AS jaccard
    FROM co
    JOIN deg da ON da.item = co.item_a
    JOIN deg db ON db.item = co.item_b
    WHERE n_co >= {COVIEW_SIM_MIN_CO}
    """,
    tags=("graph", "recommendation", "similarity"),
)
def coview_item_similarity(spark, sf_dir):
    """Item-item co-view Jaccard — the classic item-based collaborative-
    filtering similarity ("viewers of A also viewed B") over the same
    user→item view relation the coview graph family mines: for every
    item pair co-viewed by ≥ 2 users, |users(a) ∩ users(b)| /
    |users(a) ∪ users(b)| in exact integer micro units.

    Scale shape: the pair fan-out is the per-user self-join — quadratic
    in PER-USER list size, which is why the heavy-user gate (≤ 32
    distinct items, the standard co-occurrence cap, enforced identically
    in the oracle) bounds it at 32²/2 pairs per user; the pair counts
    and item degrees are partial aggregates, and the degree joins key on
    items (shuffle joins — item degree tables at 10⁹ items exceed
    broadcast).  No item-level cross product ever forms."""
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ui0 = (
        e.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    uc = (
        ui0.groupBy("user_id")
        .agg(F.count("*").alias("n_items"))
        .filter(F.col("n_items") <= COVIEW_SIM_MAX_USER_ITEMS)
        .select("user_id")
    )
    ui = ui0.join(uc, "user_id").persist()
    b = ui.select(F.col("user_id").alias("uid"), F.col("item").alias("item_b"))
    co = (
        ui.join(b, (ui.user_id == b.uid) & (ui.item < b.item_b))
        .groupBy(F.col("item").alias("item_a"), "item_b")
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= COVIEW_SIM_MIN_CO)
    )
    deg = ui.groupBy("item").agg(F.count("*").alias("n_u"))
    da = deg.select(F.col("item").alias("item_a"), F.col("n_u").alias("users_a"))
    db = deg.select(F.col("item").alias("item_b"), F.col("n_u").alias("users_b"))
    result = (
        co.join(da, "item_a")
        .join(db, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_co",
            "users_a",
            "users_b",
            (
                ratio_micro(
                    F.col("n_co"),
                    F.col("users_a") + F.col("users_b") - F.col("n_co"),
                ).cast("double")
                / 1000000
            ).alias("jaccard"),
        )
    )
    return materialized(result, ui)


@register(
    "coview_clustering_coefficient",
    oracle=f"""
    WITH ui AS (SELECT DISTINCT user_id,
                       CAST(props->>'$.k' AS INTEGER) AS item
                FROM events WHERE event_type = 'view'),
    e AS (SELECT DISTINCT a.item AS lo, b.item AS hi
          FROM ui a JOIN ui b
            ON a.user_id = b.user_id AND a.item < b.item),
    tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM e e1
            JOIN e e2 ON e2.lo = e1.hi
            JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
    tx AS (SELECT item, count(*) AS n_triangles FROM (
               SELECT a AS item FROM tri UNION ALL
               SELECT b FROM tri UNION ALL
               SELECT c FROM tri) GROUP BY item),
    deg AS (SELECT item, count(*) AS degree FROM (
                SELECT lo AS item FROM e UNION ALL SELECT hi FROM e)
            GROUP BY item)
    SELECT d.item, d.degree,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN CAST({ratio_micro_sql(
                    "2 * coalesce(t.n_triangles, 0)",
                    "d.degree * (d.degree - 1)",
                )} AS DOUBLE) / 1000000
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN tx t ON t.item = d.item
    """,
    tags=("graph", "triangle", "clustering-coefficient"),
)
def coview_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient per co-view item — the normalized
    form of ``triangle_count``'s raw participation: cc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)), the community-density score that separates
    items inside tight co-browse cliques (accessories of one product
    line) from hub items that bridge unrelated neighborhoods (cc → 0 as
    degree grows without closure).  All nodes are reported; degree-1
    nodes get cc = 0.

    Scale shape: reuses triangle_count's canonical-orientation wedge
    join (one edge cache feeds wedges, the closing probe, AND the degree
    count — edges are scanned, never rebuilt); degrees and triangle
    participation are partial aggregates keyed by item; the cc ratio is
    exact integer micro.  Same heavy-user upstream-cap note as the rest
    of the coview family."""
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    ui = (
        e.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    b = ui.select(F.col("user_id").alias("uid"), F.col("item").alias("item_b"))
    edges = (
        ui.join(b, (ui.user_id == b.uid) & (ui.item < b.item_b))
        .select(F.col("item").alias("lo"), F.col("item_b").alias("hi"))
        .distinct()
        .persist()
    )
    e1 = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = edges.select(F.col("lo").alias("b2"), F.col("hi").alias("c"))
    wedges = e1.join(e2, e1.b == e2.b2).select("a", "b", "c")
    closing = edges.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    tx = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("lo").alias("item"))
        .unionByName(edges.select(F.col("hi").alias("item")))
        .groupBy("item")
        .agg(F.count("*").alias("degree"))
    )
    result = (
        deg.join(tx, "item", "left")
        .select(
            "item",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                ratio_micro(
                    2 * F.coalesce(F.col("n_triangles"), F.lit(0)),
                    F.col("degree") * (F.col("degree") - 1),
                ).cast("double")
                / 1000000,
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )
    return materialized(result, edges)
