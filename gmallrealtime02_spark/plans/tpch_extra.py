"""Remaining TPC-H-shaped relational surface (Q6/Q7/Q8/Q9/Q10/Q12/Q13/
Q15/Q19/Q20/Q21/Q22 shapes, adapted to the fixture star schema — no
partsupp table, no shipmode/commitdate columns, so those predicates map
onto the columns that exist).

The reference has no SQL frontend at all (SURVEY.md §0) — its only
aggregations are ES terms-aggs (gmall-publisher/.../DauServicelmpl.java:27-74).
These queries exist because the new engine's serving layer is Spark SQL,
and a user replacing the reference's ES DSL would immediately reach for
exactly this family: selective scans, multi-way star joins, conditional
aggregation, decorrelated subqueries, anti-join "customers without X".

Scale notes per query are in the docstrings; the shared discipline:
dims broadcast, facts shuffle at most once on a join/group key, money
accumulates as DECIMAL so results are partitioning-invariant
(operators/aggregates.py), and timestamp bounds go through ``ts_bounds``
so they reach the parquet scan as pushed filters on the raw nanos longs
(sources/tables.py — row-group skipping on a date-sorted fact at scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.aggregates import dsum, top_k_global
from ..sources import load_table
from ..sources.tables import ensure_parallelism
from ..functions.numeric import ratio_micro, ratio_micro_sql
from .registry import register

# ---------------------------------------------------------------------------
# Q6 — pure scan + pushed predicates + single global aggregate
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("tpch", "pushdown", "A1"),
)
def forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped forecast-revenue-change: every predicate is
    scan-pushable (shipdate range via raw-nanos bound, discount/quantity
    as plain parquet filters), so at scale this reads only the row
    groups of one ship-year and aggregates to a single row with no
    shuffle at all (partial sums merge at the driver)."""
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_bounds={"l_shipdate": ("1996-01-01", "1996-12-31 23:59:59.999999")},
    ).filter(
        F.col("l_discount").between(0.04, 0.06) & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q7 — two-role dimension (nation joined twice), year bucketing
# ---------------------------------------------------------------------------


@register(
    "volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INTEGER) AS l_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE n1.n_name < n2.n_name) t
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "two-role-dim"),
)
def volume_shipping(spark, sf_dir):
    """TPC-H Q7-shaped volume shipping: nation participates in two roles
    (supplier side and customer side) — two independent broadcasts of the
    same 25-row dim, disambiguated by alias.  The fact shuffles once on
    l_orderkey for the orders join; every dim (supplier, customer,
    nation x2) broadcasts, and the pair-inequality predicate prunes
    before aggregation so the exchange carries only surviving rows."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q8 — market share: conditional share of a two-level dim-filtered star
# ---------------------------------------------------------------------------


@register(
    "market_share",
    oracle=f"""
    SELECT o_year,
           CAST({ratio_micro_sql(
               "CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume "
               "ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS HUGEINT)",
               "CAST(sum(volume) * 1000000 AS HUGEINT)",
           )} AS DOUBLE) / 1000000 AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') t
    GROUP BY o_year
    """,
    tags=("tpch", "conditional-agg", "snowflake"),
)
def market_share(spark, sf_dir):
    """TPC-H Q8-shaped market share: NATION_3's share of ECONOMY-part
    revenue sold into AMERICA-region customers, per order year.  The
    region filter prunes nation n1 BEFORE broadcast (24->5 rows), the
    p_type filter prunes part before broadcast — both reduce the fact
    early.  Exact-decimal conditional numerator keeps the ratio
    partitioning-invariant."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    nat = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                # exact-decimal micro rounding (functions.numeric): both
                # sums stay DECIMAL through the helper, so the 100 TB
                # magnitude bound is decimal-38, not int64
                ratio_micro(F.sum(nat) * 1000000, F.sum(vol) * 1000000)
                .cast("double")
                / 1000000
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product profit (cost adapted: no partsupp ⇒ priced from part)
# ---------------------------------------------------------------------------


@register(
    "product_profit",
    oracle="""
    SELECT nation_name, o_year, CAST(sum(amount) AS DOUBLE) AS profit
    FROM (SELECT n_name AS nation_name,
                 CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      - 0.2 * p_retailprice * l_quantity AS DECIMAL(18,6)) AS amount
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%widget%') t
    GROUP BY nation_name, o_year
    """,
    tags=("tpch", "join", "like-filter"),
)
def product_profit(spark, sf_dir):
    """TPC-H Q9-shaped product-profit per supplier nation per year.  The
    fixture schema has no partsupp/ps_supplycost, so cost is adapted to
    0.2 x part retail price x quantity (same shape: a per-part cost
    joined into the fact).  LIKE '%widget%' is a non-pushable substring
    filter applied on the broadcast side (tiny), never on the fact."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.2 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: quarter-bounded star join, global top-20
# ---------------------------------------------------------------------------


@register(
    "returned_item_customers",
    oracle="""
    SELECT c_custkey AS cust_key, c_name AS cust_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           c_acctbal AS acctbal, n_name AS nation_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, cust_key ASC LIMIT 20
    """,
    tags=("tpch", "topk", "pushdown"),
)
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10-shaped returned-item report: which customers returned the
    most revenue in one quarter.  The quarter bound pushes to the orders
    scan (raw-nanos pushed filter), l_returnflag='R' pushes to the
    lineitem scan; the join then runs on two pre-reduced inputs and the
    global top-20 is TakeOrdered (no full sort)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(
        spark,
        sf_dir,
        "orders",
        ts_bounds={"o_orderdate": ("1996-01-01", "1996-03-31 23:59:59.999999")},
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )
    return top_k_global(
        agg.select("cust_key", "cust_name", "revenue", "acctbal", "nation_name"),
        [F.col("revenue").desc(), F.col("cust_key").asc()],
        20,
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority counts (shipmode adapted to returnflag)
# ---------------------------------------------------------------------------


@register(
    "late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
    tags=("tpch", "conditional-agg", "theta"),
)
def late_shipment_priority(spark, sf_dir):
    """TPC-H Q12-shaped: for late shipments (>30 days after order date),
    how many carried high- vs low-priority orders, per return flag (the
    fixture's stand-in for shipmode).  The lateness predicate is a theta
    residual on the equi join; the two conditional counts are one pass
    (no self-join), partial-aggregated map-side."""
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate", "l_returnflag"
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join with residual)
# ---------------------------------------------------------------------------


@register(
    "order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey) t
    GROUP BY c_count
    """,
    tags=("tpch", "outer-join", "distribution"),
)
def order_count_distribution(spark, sf_dir):
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed N (non-low-priority) orders, INCLUDING zero — which forces a
    left-outer join (count(o_orderkey) ignores the nulls an inner join
    would drop entirely).  The residual predicate lives in the join
    condition, not a post-filter — a post-filter would turn the outer
    join back into an inner one.  Second tiny shuffle on c_count."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate + scalar-max self-reference)
# ---------------------------------------------------------------------------


@register(
    "top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey AS supplier_key, s_name AS supplier_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=("tpch", "scalar-subquery"),
)
def top_supplier(spark, sf_dir):
    """TPC-H Q15-shaped top supplier of a quarter.  The revenue CTE is
    computed once; the scalar max over it is a 1-row broadcast joined
    back (Catalyst's decorrelation of the scalar subquery, written
    explicitly).  Exact-decimal revenue makes the double equality safe:
    both sides derive from the same partitioning-invariant sum."""
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_bounds={"l_shipdate": ("1996-01-01", "1996-03-31 23:59:59.999999")},
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
            "total_revenue",
        )
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive banded predicates over a dim join
# ---------------------------------------------------------------------------


@register(
    "banded_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "disjunction"),
)
def banded_revenue(spark, sf_dir):
    """TPC-H Q19-shaped disjunctive banded revenue: three (brand, size,
    quantity) bands OR'd together.  The part side of each disjunct
    (brand+size) is dim-only, so the broadcast side is pre-reduced to
    the union of the three brand/size sets before the join; the
    mixed-side quantity bands stay as a residual.  One fact pass, no
    union-of-three-scans rewrite needed."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35))
    )
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q22 — idle high-balance customers (scalar threshold + anti join)
# ---------------------------------------------------------------------------


@register(
    "idle_customer_balance",
    oracle="""
    WITH thr AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                   AS avg_bal
        FROM customer WHERE c_acctbal > 0.0)
    SELECT n_name AS nation_name, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN thr
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
    tags=("tpch", "anti", "scalar-subquery"),
)
def idle_customer_balance(spark, sf_dir):
    """TPC-H Q22-shaped sales opportunity: customers with above-average
    positive balance and no RECENT order (none since 2000-01-01),
    counted per nation.  The average-balance threshold is an exact
    decimal-sum/count (NOT a double avg — double summation is
    order-dependent, and a threshold that moves by 1 ulp can flip
    membership vs the oracle).  The recency bound pushes to the orders
    scan BEFORE the left-anti join, so only recent o_custkeys cross the
    exchange."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(
        spark, sf_dir, "orders", ts_bounds={"o_orderdate": ("2000-01-01", None)}
    ).select("o_custkey")
    n = load_table(spark, sf_dir, "nation")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (dsum("c_acctbal", 2) / F.count("*")).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — excess-stock suppliers (nested aggregate predicate)
# ---------------------------------------------------------------------------


@register(
    "excess_stock_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, l_partkey,
               sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                         AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                        THEN CAST(l_quantity AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1996,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_total
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2)
    SELECT s_suppkey AS supplier_key, l_partkey AS part_key,
           CAST(qty_1996 AS DOUBLE) AS qty_1996,
           CAST(qty_total AS DOUBLE) AS qty_total
    FROM supplier JOIN shipped ON s_suppkey = l_suppkey
    WHERE CAST(qty_1996 AS DOUBLE) > 0.3 * CAST(qty_total AS DOUBLE)
    """,
    tags=("tpch", "nested-agg"),
)
def excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20-shaped excess-stock detection (no partsupp table, so
    "stock" is priced from shipped lineitems): (supplier, part) pairs
    whose 1996 shipped quantity exceeds 30% of their all-time total —
    both aggregates come out of ONE pass over the widget-filtered fact
    (conditional decimal sum next to the unconditional one), then a
    broadcast supplier join.  The original's nested-subquery shape
    collapses into a single grouped scan: no second fact pass, no
    correlated re-execution."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    # literals MUST be NTZ (sources/tables.py rule): an LTZ cast coerces
    # the NTZ column through the session timezone, flipping rows in DST
    # gaps on a non-UTC driver session and diverging from the oracle
    in_1996 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(in_1996, qty).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).alias("qty_1996"),
            F.sum(qty).alias("qty_total"),
        )
    )
    return (
        shipped.filter(
            F.col("qty_1996").cast("double") > 0.3 * F.col("qty_total").cast("double")
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supplier_key"),
            F.col("l_partkey").alias("part_key"),
            F.col("qty_1996").cast("double").alias("qty_1996"),
            F.col("qty_total").cast("double").alias("qty_total"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — waiting-orders blame (semi + anti with outer-referencing predicate)
# ---------------------------------------------------------------------------


@register(
    "late_supplier_blame",
    oracle="""
    SELECT s_name AS supplier_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
    tags=("tpch", "semi", "anti"),
)
def late_supplier_blame(spark, sf_dir):
    """TPC-H Q21-shaped sole-blame analysis: per supplier, how many
    finished multi-supplier orders were late ONLY because of them
    (late = shipped >60 days after order date).  EXISTS becomes a
    left-semi join (another supplier touched the order), NOT EXISTS a
    left-anti join whose condition references the outer side's
    o_orderdate — Spark join conditions span both sides, so the
    correlated subquery needs no re-execution; each is one pass over the
    key columns of lineitem."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        ensure_parallelism(li)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .filter(late)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    blamed = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("d3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_anti",
        )
    )
    return (
        blamed.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (aggregate-filtered fact joined back to itself)
# ---------------------------------------------------------------------------


@register(
    "large_order_customers",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty FROM (
        SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               big.sum_qty,
               ROW_NUMBER() OVER (
                   ORDER BY o.o_totalprice DESC, o.o_orderdate ASC,
                            o.o_orderkey ASC
               ) AS rnk
        FROM (
            SELECT l_orderkey,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 170
        ) big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    ) WHERE rnk <= 100
    """,
    tags=("tpch", "J1", "A3"),
)
def large_order_customers(spark, sf_dir):
    """TPC-H Q18-shaped large-volume orders: per-order quantity totals
    filtered by a HAVING threshold, joined back to orders + customer,
    global top-100 by order value.

    Scale shape: the lineitem aggregation is the only fact shuffle
    (partial map-side sums on l_orderkey); the survivor set (~0.1% of
    orders at threshold 170) rides a broadcast into the orders join, so
    the orders fact never shuffles.  Quantities accumulate as DECIMAL so
    the HAVING boundary is partitioning-invariant; top-100 is the
    per-partition-local + global-merge shape of top_k_global."""
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        by=("l_orderkey",),
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 170)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )
    return top_k_global(
        joined,
        order=[F.col("o_totalprice").desc(), F.col("o_orderdate").asc(),
               F.col("o_orderkey").asc()],
        k=100,
    ).select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")


# ---------------------------------------------------------------------------
# Q11 — important stock value (scalar-subquery threshold over one grouping)
# ---------------------------------------------------------------------------


@register(
    "important_stock_value",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS part_key, CAST(value AS DOUBLE) AS part_value
    FROM pv
    WHERE value * (SELECT count(*) FROM pv) > (SELECT sum(value) FROM pv) * 2
    """,
    tags=("tpch", "scalar-subquery", "A3"),
)
def important_stock_value(spark, sf_dir):
    """TPC-H Q11-shaped important stock value (no partsupp in the fixture
    schema, so supplied value per part derives from lineitem): per-part
    supplied value within one nation, keeping parts above 2x the mean
    part value (TPC-H's FRACTION is 0.0001/SF — scale-dependent by
    construction; the mean-multiple rule is the scale-invariant
    equivalent, selective at every SF).

    Scale shape: the per-part aggregation is the only fact shuffle
    (map-side partial DECIMAL sums on l_partkey); the nation's supplier
    set broadcasts into the scan side.  The Q11 scalar subquery — the
    grand total — re-aggregates the already-grouped per-part table
    (part-cardinality, ≪ fact) and arrives as ONE driver-collected
    literal, so the threshold filter is scan-side on the grouped result;
    the fact is read exactly once (the grouped table is persisted for
    its two consumers).  The threshold test cross-multiplies exact
    DECIMAL sums (value·n_parts > total·2) — no division, no doubles,
    partitioning- and engine-invariant."""
    from ..caching import materialized

    result, caches = _important_stock_value_plan(spark, sf_dir)
    return materialized(result, *caches)


def _important_stock_value_plan(spark, sf_dir):
    """Lazy (result, caches) pair — the plan gate inspects this; the
    registered fn materializes and releases the grouped-table cache."""
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_suppkey", "l_extendedprice"
        ),
        by=("l_partkey",),
    )
    # value stays DECIMAL end-to-end (dsum's double cast would make the
    # threshold order-dependent float math); the grand total is therefore
    # an exact decimal and the cross-multiplied filter is exact integer
    # arithmetic on both engines — double appears only in the output
    pv = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
        .persist()
    )
    row = pv.agg(
        F.sum("value").alias("t"), F.count("*").alias("n")
    ).collect()[0]
    total, n_parts = row["t"], row["n"]
    result = (
        pv.filter(F.col("value") * F.lit(n_parts) > F.lit(total) * 2)
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("value").cast("double").alias("part_value"),
        )
    )
    return result, (pv,)
