"""Analytics + serving-layer queries: aggregations (A1-A3/A6 family),
window functions, top-k, set ops, pivot, CDC splitter path, scalar
functions (SURVEY.md §2.5-2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.aggregates import (
    davg,
    dsum,
    group_avg_ordered,
    top_k_global,
    top_k_per_group,
)
from ..operators.cdc import ods_split, route_topic
from ..operators.windows import running_total, sessionize, user_event_seq
from ..sources import load_table
from ..functions.numeric import ratio_micro, ratio_micro_sql
from .registry import register

# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_avg_ordered",
    oracle=f"""
    SELECT event_type, count(*) AS ct,
           CAST({ratio_micro_sql(
               "CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))"
               " * 1000000 AS HUGEINT)",
               "count(value) * 1000000",
           )} AS DOUBLE) / 1000000 AS avg_value
    FROM events GROUP BY event_type
    """,
    tags=("A3",),
)
def agg_avg_ordered(spark, sf_dir):
    """GROUP BY + AVG + ORDER BY aggregate — ES DSL demo MyEsUtil.scala:25."""
    return group_avg_ordered(load_table(spark, sf_dir, "events"))


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_disc_price,
           CAST({ratio_micro_sql(
               "CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))"
               " AS DECIMAL(38,2)) * 100 AS HUGEINT)",
               "count(l_quantity) * 100",
           )} AS DOUBLE) / 1000000 AS avg_qty,
           CAST({ratio_micro_sql(
               "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))"
               " AS DECIMAL(38,2)) * 100 AS HUGEINT)",
               "count(l_extendedprice) * 100",
           )} AS DOUBLE) / 1000000 AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A2", "A3", "tpch"),
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: multi-agg hash aggregation with
    map-side partials; decimal accumulation ⇒ partitioning-invariant.
    The shipdate bound goes through ``ts_bounds`` so it reaches the
    parquet scan as a raw-long pushed filter (row-group skipping on a
    date-sorted fact at scale), not a post-conversion residual."""
    from ..sources.tables import ensure_parallelism

    li = ensure_parallelism(
        load_table(
            spark, sf_dir, "lineitem", ts_bounds={"l_shipdate": (None, "1998-09-02")}
        )
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "sum_disc_price"
            ),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_by_nation",
    oracle="""
    SELECT n_name AS nation_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("J2", "A2", "tpch"),
)
def revenue_by_nation(spark, sf_dir):
    """TPC-H Q5-shaped star join + agg: fact shuffles once on the join key;
    dims broadcast."""
    from ..sources.tables import ensure_parallelism

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )


@register(
    "distinct_users_daily",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
           count(DISTINCT user_id) AS uniques
    FROM events GROUP BY 1, 2
    """,
    tags=("A4",),
)
def distinct_users_daily(spark, sf_dir):
    """Exact distinct aggregation (expand+two-phase under the hood)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt", "event_type")
        .agg(F.countDistinct("user_id").alias("uniques"))
    )


# ---------------------------------------------------------------------------
# Top-k / sort / limit (§2.7)
# ---------------------------------------------------------------------------


@register(
    "top_customers",
    oracle="""
    SELECT o_custkey AS user_id,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey
    ORDER BY spend DESC, user_id ASC LIMIT 10
    """,
    tags=("sort", "limit"),
)
def top_customers(spark, sf_dir):
    """Global top-k: agg then TakeOrderedAndProject (no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_custkey").alias("user_id")).agg(
        dsum("o_totalprice", 2).alias("spend")
    )
    return top_k_global(agg, [F.col("spend").desc(), F.col("user_id").asc()], 10)


@register(
    "top_events_per_user",
    oracle="""
    SELECT event_id, user_id, value, rank_in_group FROM (
        SELECT event_id, user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id ASC) AS rank_in_group
        FROM events
    ) WHERE rank_in_group <= 3
    """,
    tags=("window", "topk"),
)
def top_events_per_user(spark, sf_dir):
    """Top-k per group via ranked window — single shuffle on the group key."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return top_k_per_group(
        e, ["user_id"], [F.col("value").desc(), F.col("event_id").asc()], 3
    )


# ---------------------------------------------------------------------------
# Window functions / sessionization (§2.6)
# ---------------------------------------------------------------------------


@register(
    "user_event_seq",
    oracle="""
    SELECT event_id, user_id, ts, event_type,
           ROW_NUMBER() OVER w AS seq,
           lag(ts) OVER w AS prev_ts,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def user_event_seq_q(spark, sf_dir):
    """row_number + lag + gap — the analytic surface the reference lacks
    (SURVEY.md §2.6: A4/A5 are semantically ROW_NUMBER()=1)."""
    return user_event_seq(load_table(spark, sf_dir, "events"))


@register(
    "sessionize",
    oracle="""
    SELECT event_id, user_id, ts, event_type,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END AS is_new
        FROM (SELECT event_id, user_id, ts, event_type,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events)
    )
    """,
    tags=("window", "session"),
)
def sessionize_q(spark, sf_dir):
    """Gap-based sessionization (lag + conditional cumsum); streaming twin
    is session_window."""
    return sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)


@register(
    "running_total",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
    tags=("window",),
)
def running_total_q(spark, sf_dir):
    """Running per-user sum with an explicit rows frame."""
    return running_total(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Set ops + pivot (§2.7)
# ---------------------------------------------------------------------------


@register(
    "purchasers_without_errors",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
      AND strftime(ts, '%Y-%m-%d') = '2024-01-01'
    """,
    tags=("setop",),
)
def purchasers_without_errors(spark, sf_dir):
    """EXCEPT set op (distinct semantics): purchasers minus day-1 errorers.

    (The day filter keeps the result non-empty at every sf — without it
    every purchaser eventually errors and the query degenerates to ∅.)
    """
    e = load_table(spark, sf_dir, "events")
    day1_errors = e.filter(
        (F.col("event_type") == "error")
        & (F.date_format("ts", "yyyy-MM-dd") == "2024-01-01")
    ).select("user_id")
    return (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .subtract(day1_errors)
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "pivot_event_counts",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events GROUP BY 1
    """,
    tags=("pivot",),
)
def pivot_event_counts(spark, sf_dir):
    """Pivot with an explicit value list (single-pass, no second scan)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


@register(
    "unpivot_event_counts",
    # the round-trip collapses to the long-form count — the value of the
    # query is the UNPIVOT operator in the physical plan (Expand), the
    # inverse of pivot_event_counts
    # the type list is pinned on BOTH sides: the Spark unpivot is
    # restricted to _EVENT_TYPES, so the oracle must be too — otherwise
    # a sixth event_type appearing in the fixture would emit oracle rows
    # the melt (correctly) omits and silently break the hash-match
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
           CAST(count(*) AS BIGINT) AS ct
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
    GROUP BY 1, 2
    """,
    tags=("unpivot", "melt"),
)
def unpivot_event_counts(spark, sf_dir):
    """Unpivot (melt): the wide per-day event matrix back to long
    (dt, event_type, ct) rows via the native unpivot/Expand operator —
    the inverse of ``pivot_event_counts`` and the standard shape-change
    before a long-form join or chart feed.  Zero-count cells (absent in
    the long form) are dropped on the way out.  Scale: Expand is
    scan-side over the tiny wide table; the only exchange is the pivot
    aggregate's own."""
    wide = pivot_event_counts(spark, sf_dir)
    return (
        wide.unpivot("dt", _EVENT_TYPES, "event_type", "ct")
        .filter(F.col("ct") > 0)
        .select("dt", "event_type", F.col("ct").cast("bigint"))
    )


# ---------------------------------------------------------------------------
# CDC splitter path (P1/P5/P7/K2) + scalar functions (§2.8)
# ---------------------------------------------------------------------------


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
    FROM events
    """,
    tags=("P1", "json"),
)
def json_extract_props(spark, sf_dir):
    """Ad-hoc JSON field access — get_json_object (fastjson getJSONObject
    in the reference, DauApp.scala:66)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@register(
    "cdc_splitter",
    oracle="""
    SELECT 'ODS_MM_' || upper(event_type) AS topic,
           event_type AS tbl, 'insert' AS op,
           CAST(event_id AS VARCHAR) AS id, CAST(user_id AS VARCHAR) AS uid
    FROM events WHERE event_type IN ('purchase', 'signup')
    """,
    tags=("P1", "P5", "P7", "K2"),
)
def cdc_splitter(spark, sf_dir):
    """Full ODS splitter path (parse → filter → explode → route) over a
    Canal envelope synthesized from events; the oracle is the identity
    because the envelope round-trips — OdsGmallCanal.scala:42-53.

    The synthesized envelope batch is PERSISTED at the raw-string
    boundary — exactly where a Kafka micro-batch materializes in the
    streaming twin.  Without the boundary, Catalyst pushes the
    table/type predicate (a pruned from_json probe) below the
    parallelism spread onto the single-split scan, serializing all the
    Jackson work on one task AND constant-folding the synthesis into a
    per-row to_json+from_json+probe chain evaluated 2-3x (measured
    2.1 s at sf0.1; 0.4 s with the boundary).  Above the cache, the
    parse runs once per row across all cores — the true streaming
    shape.  At 100 TB the raw batch never exists as a table at all
    (it IS the Kafka batch), so the persist models reality rather than
    costing it.
    """
    from ..caching import materialized
    from ..sources.tables import ensure_parallelism

    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    raw = e.select(
        F.to_json(
            F.struct(
                F.lit("gmall").alias("database"),
                F.col("event_type").alias("table"),
                F.lit("insert").alias("type"),
                F.array(
                    F.create_map(
                        F.lit("id"), F.col("event_id").cast("string"),
                        F.lit("uid"), F.col("user_id").cast("string"),
                    )
                ).alias("data"),
            )
        ).alias("value")
    ).persist()
    split = ods_split(raw, [("purchase", ["insert"]), ("signup", ["insert"])])
    return materialized(
        split.select(
            "topic",
            F.col("table").alias("tbl"),
            F.col("type").alias("op"),
            F.col("row")["id"].alias("id"),
            F.col("row")["uid"].alias("uid"),
        ),
        raw,
    )


@register(
    "word_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
    tags=("P7", "explode"),
)
def word_explode(spark, sf_dir):
    """Array explode (the Canal data-array explode shape, P7)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "topic_route",
    oracle="""
    SELECT DISTINCT event_type,
           'ODS_MM_' || upper(event_type) AS topic
    FROM events
    """,
    tags=("K2",),
)
def topic_route_q(spark, sf_dir):
    """Dynamic topic routing column — OdsGmallCanal.scala:46."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_type", route_topic(F.col("event_type")).alias("topic")
    ).distinct()


# ---------------------------------------------------------------------------
# Extended relational surface: grouping sets, semi/anti joins, as-of join,
# range join (SURVEY.md §2.4/2.5 "not present in the reference" items,
# exposed because Catalyst provides them natively)
# ---------------------------------------------------------------------------

from ..operators.windows import asof_prev_event  # noqa: E402


@register(
    "revenue_rollup",
    oracle="""
    SELECT r_name AS region_name, n_name AS nation_name,
           GROUPING(r_name, n_name) AS gid,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("rollup", "grouping-sets"),
)
def revenue_rollup(spark, sf_dir):
    """ROLLUP(region, nation) with grouping id — hierarchical subtotals in
    one pass (Expand + single shuffle), not three separate aggregations."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(
            F.grouping_id().alias("gid"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
        )
    )


@register(
    "customers_no_orders",
    oracle="""
    SELECT c_custkey AS user_id, c_name AS user_name, c_mktsegment AS segment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
)
def customers_no_orders(spark, sf_dir):
    """Left-anti join (NOT EXISTS) — dims broadcast the key set, no row
    payload crosses the wire."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey AS user_id, c_acctbal AS balance
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "semi"),
)
def customers_with_orders(spark, sf_dir):
    """Left-semi join (EXISTS): early-out probe, emits each left row once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("user_id"), F.col("c_acctbal").alias("balance")
    )


@register(
    "asof_prev_view",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, v.ts AS prev_src_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    tags=("join", "asof", "window"),
)
def asof_prev_view(spark, sf_dir):
    """As-of join: each purchase matched to the user's latest view at-or-
    before it — union + carry-forward (one exchange), no range join."""
    return asof_prev_event(load_table(spark, sf_dir, "events"), "purchase", "view")


_PRICE_BANDS = [
    ("budget", 0.0, 20_000.0),
    ("mid", 20_000.0, 45_000.0),
    ("premium", 45_000.0, 1e12),
]


@register(
    "price_band_join",
    oracle="""
    SELECT band, count(*) AS ct,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN (VALUES ('budget', 0.0, 20000.0),
                 ('mid', 20000.0, 45000.0),
                 ('premium', 45000.0, 1e12)) b(band, lo, hi)
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
    tags=("join", "range"),
)
def price_band_join(spark, sf_dir):
    """Range (theta) join against a tiny bands table — broadcast
    nested-loop on 3 rows, then hash agg; the fact side never shuffles
    pre-aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count("*").alias("ct"), dsum("l_extendedprice", 2).alias("revenue"))
    )


@register(
    "start_event_route",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'signup' THEN 'GMALL_START'
                ELSE 'GMALL_EVENT' END AS topic
    FROM events
    """,
    tags=("P6", "route"),
)
def start_event_route(spark, sf_dir):
    """Start-vs-event route on FIELD PRESENCE (LoggerController.java:31-36,
    P6): the log envelope carries a `start` object only for startup logs;
    the route predicate is presence, not a type tag.  Synthesized here by
    round-tripping events through the envelope (signups play startup
    logs), so the oracle is the identity on event_type."""
    e = load_table(spark, sf_dir, "events")
    raw = e.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.when(
                    F.col("event_type") == "signup",
                    F.struct(F.lit("open").alias("entry")),
                ).alias("start"),
            )
        ).alias("value"),
    )
    return raw.select(
        "event_id",
        F.when(
            F.get_json_object("value", "$.start").isNotNull(), "GMALL_START"
        )
        .otherwise("GMALL_EVENT")
        .alias("topic"),
    )


_PAGE, _PAGE_SIZE = 3, 20


@register(
    "order_page",
    oracle=f"""
    SELECT order_id, user_id, order_status, final_total_amount, page_row FROM (
        SELECT o_orderkey AS order_id, o_custkey AS user_id,
               o_orderstatus AS order_status, o_totalprice AS final_total_amount,
               ROW_NUMBER() OVER (ORDER BY o_orderdate DESC, o_orderkey ASC)
                   AS page_row
        FROM orders
    ) WHERE page_row BETWEEN {(_PAGE - 1) * _PAGE_SIZE + 1} AND {_PAGE * _PAGE_SIZE}
    """,
    tags=("limit", "pagination", "serving"),
)
def order_page(spark, sf_dir):
    """Serving-layer pagination (dw-chart IndexController.java:79-110:
    startpage/size): deterministic global order + absolute page_row
    numbers.  The page is fetched as ``orderBy().limit(page·size)`` — a
    distributed TakeOrderedAndProject (per-task local top-k, driver-side
    merge) — and row_number runs only over those page·size survivors,
    never a global-window sort of the full orders fact on one reducer
    (the scale-killer the earlier revision had).  At scale deep pages are
    served keyset-style (WHERE (o_orderdate, o_orderkey) < last_seen
    ORDER BY ... LIMIT n), which this sort order supports."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_orderdate").desc(), F.col("order_id").asc()]
    lo, hi = (_PAGE - 1) * _PAGE_SIZE + 1, _PAGE * _PAGE_SIZE
    top = (
        o.select(
            "o_orderdate",
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_totalprice").alias("final_total_amount"),
        )
        .orderBy(*order)
        .limit(hi)
    )
    return (
        top.withColumn("page_row", F.row_number().over(Window.orderBy(*order)))
        .filter(F.col("page_row").between(lo, hi))
        .drop("o_orderdate")
    )


# ---------------------------------------------------------------------------
# Approximate + percentile aggregates (scale path: sketches shuffle O(1)
# state per group instead of O(distinct) rows)
# ---------------------------------------------------------------------------


@register(
    "daily_uniques_approx",
    oracle=None,  # HLL sketch is engine-specific; pytest bounds error vs exact
    tags=("approx", "hll", "A4"),
)
def daily_uniques_approx(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) per day — at 100 TB the
    sketch (kB) replaces the expand+two-phase exact distinct's full
    shuffle of distinct keys.  Error bound asserted in pytest."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("uniques_approx"))
    )


@register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("percentile", "agg"),
)
def value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (sort-based); the approx
    variant below is the at-scale form."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "value_percentiles_approx",
    oracle=None,  # t-digest-style sketch; pytest bounds error vs exact
    tags=("approx", "percentile"),
)
def value_percentiles_approx(spark, sf_dir):
    """approx_percentile with bounded accuracy — fixed-size sketch state
    per group; mergeable, so partial aggregation works at any scale."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-shaped analytics
# ---------------------------------------------------------------------------


@register(
    "urgent_orders_topk",
    oracle="""
    SELECT l_orderkey AS order_id,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, order_id ASC LIMIT 10
    """,
    tags=("tpch", "topk", "join"),
)
def urgent_orders_topk(spark, sf_dir):
    """TPC-H Q3-shaped: selective dim filters reach the scans, broadcast
    semi-reduced star join, agg, global top-k (TakeOrdered, no full
    sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )
    return top_k_global(
        agg.select("order_id", "revenue", "order_date"),
        [F.col("revenue").desc(), F.col("order_id").asc()],
        10,
    )


@register(
    "small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN (SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg
          FROM lineitem GROUP BY l_partkey) t ON l_partkey = pk
    WHERE l_quantity < half_avg
    """,
    tags=("tpch", "subquery", "join"),
)
def small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-shaped correlated-subquery decorrelation: the per-part
    average is computed once as an aggregate and joined back — the
    classic rewrite Catalyst applies to correlated scalar subqueries."""
    li = load_table(spark, sf_dir, "lineitem")
    half_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(half_avg, li.l_partkey == half_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (dsum("l_extendedprice", 2) / 7.0).cast("double").alias("avg_yearly")
        )
    )


@register(
    "purchasers_also_viewers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
    tags=("setop", "intersect"),
)
def purchasers_also_viewers(spark, sf_dir):
    """INTERSECT set op (distinct semantics) — the companion to the
    EXCEPT query; physically a left-semi join on the distinct sets."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .intersect(e.filter(F.col("event_type") == "view").select("user_id"))
    )


@register(
    "dau_retention",
    oracle="""
    WITH days AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS dt, user_id FROM events
    )
    SELECT dt, count(*) AS retained FROM (
        SELECT dt, user_id,
               lag(dt) OVER (PARTITION BY user_id ORDER BY dt) AS prev_dt
        FROM days
    )
    WHERE prev_dt IS NOT NULL
      AND CAST(dt AS DATE) - CAST(prev_dt AS DATE) = 1
    GROUP BY dt
    """,
    tags=("retention", "window", "A6"),
)
def dau_retention(spark, sf_dir):
    """Day-over-day retention: users active on consecutive days — distinct
    (day, user) then a per-user lag; one exchange on user_id, no
    self-join of the full event log."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "user_id")
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("dt")
    flagged = days.withColumn("prev_dt", F.lag("dt").over(w)).filter(
        F.col("prev_dt").isNotNull()
        & (F.datediff(F.to_date("dt"), F.to_date("prev_dt")) == 1)
    )
    return flagged.groupBy("dt").agg(F.count("*").alias("retained"))


# ---------------------------------------------------------------------------
# TPC-H-extended shapes + analytic window-function surface (§2.5/2.6/2.7
# "not present in the reference" items: cube, distinct aggregates, window
# frames, ranking). Exposed because Catalyst provides them natively and a
# user of the reference's serving layer would reach for them next.
# ---------------------------------------------------------------------------


@register(
    "revenue_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS ct,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("cube", "grouping-sets"),
)
def revenue_cube(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all four grouping sets in one
    Expand + a single shuffle — completes the rollup/cube family next to
    `revenue_rollup`.  Expand multiplies rows 4x BEFORE the exchange, but
    partial aggregation collapses them map-side, so the shuffle carries
    only (distinct keys x 4) rows at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("ct"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS ct,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("grouping-sets",),
)
def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS — the non-hierarchical case ROLLUP/CUBE
    can't express: per-returnflag totals, per-linestatus totals, and the
    grand total, WITHOUT the (returnflag, linestatus) cross cells a CUBE
    would also compute.  Completes the grouping-analytics family
    (`revenue_rollup`, `revenue_cube`).

    Scale shape: one Expand (3x before the exchange, collapsed by
    map-side partial aggregation to distinct-keys x 3) + a single
    shuffle — vs three separate scans+shuffles for the UNION ALL
    rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("ct"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
    )


@register(
    "promo_revenue",
    oracle=f"""
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           CAST({ratio_micro_sql(
               "CAST(CAST(sum(CASE WHEN p_type = 'PROMO' "
               "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) "
               "ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) "
               "* 1000000 AS HUGEINT) * 100",
               "CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) "
               "AS DECIMAL(18,6))) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)",
           )} AS DOUBLE) / 1000000 AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY date_trunc('month', l_shipdate)
    """,
    tags=("tpch", "conditional-agg"),
)
def promo_revenue(spark, sf_dir):
    """TPC-H Q14-shaped promo-revenue ratio per ship month: broadcast the
    part dim into the fact scan, conditional decimal sums (exact, so the
    ratio is partitioning-invariant), one shuffle on the month key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            (
                ratio_micro(
                    F.sum(promo) * 1000000 * 100, F.sum(rev) * 1000000
                ).cast("double")
                / 1000000
            ).alias("promo_pct")
        )
    )


@register(
    "order_priority_late",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi", "A2"),
)
def order_priority_late(spark, sf_dir):
    """TPC-H Q4-shaped: orders per priority having at least one lineitem
    shipped >90 days after order date.  Left-semi join with a compound
    (equi + theta) condition — the probe early-outs on first match, and
    only the key columns of lineitem cross the exchange."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "min_cost_supplier",
    oracle="""
    SELECT l_partkey AS part_key, best_price, supplier_key
    FROM (SELECT l_partkey, l_extendedprice AS best_price,
                 l_suppkey AS supplier_key,
                 row_number() OVER (PARTITION BY l_partkey
                                    ORDER BY l_extendedprice, l_suppkey) AS rn
          FROM lineitem) t
    WHERE rn = 1
    """,
    tags=("tpch", "argmin"),
)
def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped cheapest-supplier-per-part (no partsupp table in the
    fixture star schema, so priced from lineitem).  min(struct(price,
    suppkey)) instead of a ranking window: lexicographic struct-min gets
    map-side partial aggregation, so the exchange carries one row per
    part per task rather than the whole fact table — the same
    scale-critical trick as `first_seen_dedup`."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("part_key"))
        .agg(
            F.min(
                F.struct(
                    F.col("l_extendedprice").alias("best_price"),
                    F.col("l_suppkey").alias("supplier_key"),
                )
            ).alias("b")
        )
        .select("part_key", "b.best_price", "b.supplier_key")
    )


@register(
    "brand_type_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 20
    GROUP BY p_brand, p_type
    """,
    tags=("tpch", "distinct-agg"),
)
def brand_type_supplier_counts(spark, sf_dir):
    """TPC-H Q16-shaped COUNT(DISTINCT) per brand/type.  The p_size filter
    prunes the broadcast side before the join; Spark plans the distinct
    aggregate as a two-phase Expand (partial distinct per map task), so
    duplicate (brand, type, suppkey) triples collapse before the
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "nation_revenue_share",
    oracle=f"""
    WITH nr AS (
      SELECT r_name AS region_name, n_name AS nation_name,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                 AS rev_d
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT region_name, nation_name, CAST(rev_d AS DOUBLE) AS revenue,
           CAST({ratio_micro_sql(
               "CAST(CAST(rev_d AS DECIMAL(38,6)) * 1000000 AS HUGEINT)",
               "CAST(CAST(sum(rev_d) OVER (PARTITION BY region_name) "
               "AS DECIMAL(38,6)) * 1000000 AS HUGEINT)",
           )} AS DOUBLE) / 1000000 AS region_share
    FROM nr
    """,
    tags=("window", "A2"),
)
def nation_revenue_share(spark, sf_dir):
    """Windowed aggregate over an aggregate: each nation's share of its
    region's revenue.  The window runs on the POST-aggregation frame
    (25 rows at any fact scale), so the unbounded partition sum is free;
    the heavy lifting stays in the partial-agg star join."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("rev_d")
        )
    )
    w = Window.partitionBy("region_name")
    # share rounds in EXACT decimal micro-units (functions.numeric): the
    # revenue ratio is exact-decimal/exact-decimal, so round(double, 6)
    # is exposed to engine-divergent decimal midpoints
    return nr.select(
        "region_name",
        "nation_name",
        F.col("rev_d").cast("double").alias("revenue"),
        (
            ratio_micro(
                F.col("rev_d") * 1000000, F.sum("rev_d").over(w) * 1000000
            ).cast("double")
            / 1000000
        ).alias("region_share"),
    )


@register(
    "priority_daily_moving_avg",
    oracle=f"""
    WITH d AS (
      SELECT o_orderpriority, date_trunc('day', o_orderdate) AS order_day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
      FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority, order_day, day_total,
           CAST({ratio_micro_sql(
               "CAST(CAST(sum(CAST(day_total AS DECIMAL(18,2))) OVER ("
               "PARTITION BY o_orderpriority ORDER BY order_day "
               "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) "
               "AS DECIMAL(38,2)) * 100 AS HUGEINT)",
               "count(*) OVER ("
               "PARTITION BY o_orderpriority ORDER BY order_day "
               "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 100",
           )} AS DOUBLE) / 1000000 AS avg7
    FROM d
    """,
    tags=("window", "frame"),
)
def priority_daily_moving_avg(spark, sf_dir):
    """Explicit ROWS window frame: 7-day moving average of daily order
    revenue per priority.  Aggregates to one row per (priority, day)
    FIRST (partial-agg shuffle), then runs the frame over the small
    per-day series — the frame never touches raw fact rows.  Decimal
    accumulation inside the frame keeps the average bit-stable under any
    partitioning."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    d = (
        o.groupBy(
            "o_orderpriority", F.date_trunc("day", "o_orderdate").alias("order_day")
        )
        .agg(dsum("o_totalprice", 2).alias("day_total"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("order_day")
        .rowsBetween(-6, Window.currentRow)
    )
    return d.withColumn(
        "avg7",
        ratio_micro(
            F.sum(F.col("day_total").cast("decimal(18,2)")).over(w) * 100,
            F.count("*").over(w) * 100,
        ).cast("double")
        / 1000000,
    )


@register(
    "supplier_balance_quartiles",
    oracle="""
    SELECT s_suppkey AS supplier_key, s_acctbal AS balance,
           ntile(4) OVER (ORDER BY s_acctbal, s_suppkey) AS quartile,
           round(percent_rank() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank
    FROM supplier
    """,
    tags=("window", "ranking"),
)
def supplier_balance_quartiles(spark, sf_dir):
    """Ranking window functions (ntile + percent_rank) over the supplier
    dim.  Deliberately a GLOBAL window: correct on dim-sized inputs
    (single-partition sort).  For fact-sized ranking the engine's pattern
    is `top_events_per_user` (partitioned window) — a global ntile over a
    100 TB fact would be re-expressed as approx percentiles
    (`value_percentiles_approx`) instead."""
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        F.col("s_suppkey").alias("supplier_key"),
        F.col("s_acctbal").alias("balance"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# Sequential conversion funnel (view → click → purchase)
# ---------------------------------------------------------------------------


@register(
    "event_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS vts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS cts
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.vts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS pts
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.cts
        GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS event_type,
           (SELECT count(*) FROM v) AS users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM c)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM p)
    """,
    tags=("analytics", "funnel", "A4"),
)
def event_funnel(spark, sf_dir):
    """Strictly-ordered conversion funnel: users whose first view precedes
    a click that precedes a purchase (each stage anchored at the
    earliest qualifying event — the product-analytics funnel shape the
    reference's dashboard family would grow into).

    Scale shape: the fact is filtered to the three funnel event types at
    the scan, then repartitioned ONCE on user_id; every stage (min-ts
    aggregation + next-stage join) is user_id-keyed, so stages 2 and 3
    reuse the same partitioning with no further fact exchange — AQE sees
    co-partitioned children.  Stage tables shrink monotonically (v ⊇ c ⊇
    p), and the three output counts are single-row aggregates.  All
    comparisons are exact µs-timestamp orderings, so the result is
    engine- and partitioning-exact."""
    from ..caching import materialized

    result, caches = _event_funnel_plan(spark, sf_dir)
    return materialized(result, *caches)


def _event_funnel_plan(spark, sf_dir):
    """Lazy (result, caches) pair — the plan gate inspects this; the
    registered fn materializes and releases the fact cache."""
    from ..sources.tables import ensure_parallelism

    ev = ensure_parallelism(
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(["view", "click", "purchase"]))
        .select("user_id", "event_type", "ts"),
        by=("user_id",),
    ).persist()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )

    def _stage(df, stage, name):
        return df.agg(F.count("*").alias("users")).select(
            F.lit(stage).alias("stage"),
            F.lit(name).alias("event_type"),
            F.col("users"),
        )

    result = (
        _stage(v, 1, "view")
        .unionByName(_stage(c, 2, "click"))
        .unionByName(_stage(p, 3, "purchase"))
    )
    return result, (ev,)


# ---------------------------------------------------------------------------
# Record linkage (entity resolution): blocked fuzzy matching
# ---------------------------------------------------------------------------


@register(
    "record_linkage",
    oracle="""
    WITH b AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               substr(c_name, length(c_name) - 1, 2) AS blk
        FROM customer
    )
    SELECT a.c_custkey AS left_key, r.c_custkey AS right_key,
           a.c_name AS left_name, r.c_name AS right_name,
           CAST(levenshtein(a.c_name, r.c_name) AS INT) AS name_dist,
           levenshtein(a.c_name, r.c_name) <= 2
               AND a.c_mktsegment = r.c_mktsegment AS is_match
    FROM b a JOIN b r
      ON a.c_nationkey = r.c_nationkey AND a.blk = r.blk
     AND a.c_custkey < r.c_custkey
    """,
    tags=("linkage", "entity-resolution", "fuzzy", "training-data"),
)
def record_linkage(spark, sf_dir):
    """Record linkage / entity resolution by BLOCKED fuzzy matching: the
    classic Fellegi-Sunter shape — generate candidate pairs only within
    a blocking key, score each pair with an edit-distance comparator,
    classify with a threshold + agreement rule.  (Same-entity detection
    across sources is the warehouse twin of document dedup.)

    Scale shape: the all-pairs product is the thing record linkage must
    never do, and blocking is how it avoids it — candidates are a
    SELF-JOIN ON THE BLOCK KEY (nationkey + name suffix), so pair count
    is sum over blocks of |b|^2, not n^2: tasks parallelize by block and
    a 100x corpus with the same block-size distribution costs 100x, not
    10000x.  Levenshtein runs JVM-side inside codegen on only the
    blocked pairs.  Plan-gated: no CartesianProduct, join keyed on the
    block.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.substring(F.col("c_name"), -2, 2).alias("blk"),
    )
    a, r = c.alias("a"), c.alias("r")
    pairs = a.join(
        r,
        (F.col("a.c_nationkey") == F.col("r.c_nationkey"))
        & (F.col("a.blk") == F.col("r.blk"))
        & (F.col("a.c_custkey") < F.col("r.c_custkey")),
    )
    dist = F.levenshtein(F.col("a.c_name"), F.col("r.c_name"))
    return pairs.select(
        F.col("a.c_custkey").alias("left_key"),
        F.col("r.c_custkey").alias("right_key"),
        F.col("a.c_name").alias("left_name"),
        F.col("r.c_name").alias("right_name"),
        dist.alias("name_dist"),
        ((dist <= 2) & (F.col("a.c_mktsegment") == F.col("r.c_mktsegment"))).alias(
            "is_match"
        ),
    )


@register(
    "event_transition_matrix",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    tr AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST({ratio_micro_sql(
               "n", "sum(n) OVER (PARTITION BY prev_type)"
           )} AS DOUBLE) / 1000000 AS p_next
    FROM tr
    """,
    tags=("behavior", "window", "markov"),
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    for every (previous event type → next event type) pair, the
    transition count and conditional probability P(next | prev) — the
    foundation of Markov attribution, next-action prediction, and
    journey anomaly detection (a spike in view→error says more than
    error counts alone).

    Scale shape: ONE user-keyed exchange for the lag window (the same
    exchange shape sessionize/user_event_seq already pay), then a
    partial-agg groupBy whose exchange carries ≤ |event_types|² rows;
    the row-normalizing window runs on that tiny frame.  Exact integer
    micro probabilities (functions.numeric)."""
    from pyspark.sql import Window

    from ..sources.tables import ensure_parallelism

    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    tr = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    wrow = Window.partitionBy("prev_type")
    return tr.select(
        "prev_type",
        "next_type",
        "n",
        (
            ratio_micro(F.col("n"), F.sum("n").over(wrow)).cast("double")
            / 1000000
        ).alias("p_next"),
    )


@register(
    "monthly_revenue_sql",
    oracle=f"""
    WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT month, rev,
               lag(rev) OVER (ORDER BY month) AS prev
        FROM m
    )
    SELECT month, CAST(rev AS DOUBLE) AS revenue,
           CAST(rev - prev AS DOUBLE) AS delta,
           CASE WHEN prev IS NOT NULL THEN
               CAST({ratio_micro_sql(
                   "CAST((rev - prev) * 100 AS BIGINT)",
                   "CAST(prev * 100 AS BIGINT)",
               )} AS DOUBLE) / 10000
           END AS pct_change
    FROM w
    """,
    tags=("sql-surface", "window", "timeseries"),
)
def monthly_revenue_sql(spark, sf_dir):
    """Monthly revenue with month-over-month delta and % change,
    expressed ENTIRELY through the ``spark.sql`` surface over the
    registered temp views (``sources.register_views``) — the proof that
    the SQL API is first-class next to the DataFrame plans: same
    Catalyst pipeline, same pushdown/AQE, same exact-decimal and
    engine-exact-rounding discipline (``ratio_micro_spark_sql``, the
    SQL-text twin of functions.numeric, parity-pinned four ways).

    Scale shape: one month-keyed partial aggregate; the lag window runs
    on the |months|-row frame (single-partition there is fine — months
    are bounded — but a multi-decade fact would key the window by year).
    pct_change is exact integer micro over CENTS, null for the first
    month (den > 0 contract)."""
    from ..functions.numeric import ratio_micro_spark_sql
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    pct = ratio_micro_spark_sql(
        "CAST((rev - prev) * 100 AS BIGINT)", "CAST(prev * 100 AS BIGINT)"
    )
    return spark.sql(f"""
        WITH m AS (
            SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ),
        w AS (
            SELECT month, rev,
                   lag(rev) OVER (ORDER BY month) AS prev
            FROM m
        )
        SELECT month, CAST(rev AS DOUBLE) AS revenue,
               CAST(rev - prev AS DOUBLE) AS delta,
               CASE WHEN prev IS NOT NULL THEN
                   CAST({pct} AS DOUBLE) / 10000
               END AS pct_change
        FROM w
    """)
