"""Dimension-enrichment joins (SURVEY.md §2.4 J1-J3).

The reference enriches fact streams against dims three ways: per-record
JDBC lookups (DwdOrderInfoApp.scala:65-73, J1), a driver-built broadcast
map refreshed per batch (DwdOrderInfoApp.scala:87-109, J2), and a chained
4-way broadcast snowflake where each join produces the next join's keys
(DwdOrderDetailApp.scala:65-133, J3).  All three collapse into declarative
left equi-joins here — Catalyst's broadcast-hash strategy IS the
reference's hand-built broadcast map, chosen automatically by size with
an explicit ``F.broadcast`` hint where we know the dim is small.

Scale notes:
- Dims (region/nation/customer-sized) broadcast: zero shuffle of the fact
  side.  At 100 TB fact scale that is the difference between a map-side
  join and a multi-TB exchange.
- The snowflake chain keeps left-join order because the sku join produces
  the keys for the downstream dims (same dependency as the reference);
  Catalyst still reorders/fuses physical stages where legal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_orders(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """order_info enrichment (J1 user dim + J2 geo dim), testdata mapping
    per FIXTURES.md §5: customer plays user_info, nation/region play
    base_province.

    Left-outer semantics mirror the reference's null-safe enrich
    (DwdOrderInfoApp.scala:99-103).  Derived create_date/create_hour per
    DwdOrderInfoApp.scala:47-50 (P3).
    """
    o = orders.withColumn(
        "create_date", F.date_format("o_orderdate", "yyyy-MM-dd")
    ).withColumn("create_hour", F.date_format("o_orderdate", "HH"))
    return (
        o.join(F.broadcast(customer), o.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
            "create_date",
            "create_hour",
            F.col("c_name").alias("user_name"),
            F.col("c_mktsegment").alias("user_segment"),
            F.col("n_name").alias("province_name"),
            F.col("r_name").alias("region_name"),
        )
    )


def enrich_detail_snowflake(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """order_detail 4-way snowflake enrichment (J3).

    Mirrors DwdOrderDetailApp.scala:65-133: the first join (sku≈part,
    supp) produces the keys (s_nationkey) consumed by the next joins
    (nation → region), preserving the reference's ordering dependency.
    All dims broadcast — the fact table never shuffles (the conditional
    repartition below only fires on a one-split local scan; at scale the
    fact arrives pre-split and flows straight through).
    """
    from ..sources.tables import ensure_parallelism

    lineitem = ensure_parallelism(lineitem)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey, "left")
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey, "left")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            F.col("p_name").alias("sku_name"),
            F.col("p_brand").alias("tm_name"),
            F.col("p_type").alias("spu_name"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("supplier_nation"),
            F.col("r_name").alias("supplier_region"),
        )
    )
