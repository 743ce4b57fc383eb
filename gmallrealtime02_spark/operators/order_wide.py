"""Order-wide join (SURVEY.md §2.4 J4 + §2.5 A5).

The reference joins the order_info and order_detail streams with
overlapping 10s/5s sliding windows (DwsOrderWideApp.scala:88-97, J4) and
then removes the duplicates the overlap creates via a Redis ZSET keyed by
order_detail_id (DwsOrderWideApp.scala:104-122, J5/A5).  In batch form
this is a plain inner equi-join + first-seen dedup on the detail id; the
streaming form (streaming/jobs.py) is a watermarked stream-stream join
which needs no post-dedup at all.

The column merge/renames mirror bean/OrderWide.scala:40-80
(order_price → sku_price at OrderWide.scala:69).

Scale notes: fact⋈fact is the one unavoidable big shuffle — both sides
hash-exchange on the order key.  AQE handles skewed order keys
(skewJoin.enabled); at 100 TB the right physical layout is bucketing both
tables by order key at write time, which removes the exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dau import first_seen_dedup


def order_wide(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """orders ⋈ lineitem → wide rows, unique per detail id.

    Testdata mapping (FIXTURES.md §5): orders plays order_info, lineitem
    plays order_detail (l_orderkey→order_id, l_partkey→sku_id,
    l_extendedprice→order_price≈sku_price, l_quantity→sku_num).
    """
    from ..sources.tables import ensure_parallelism

    # pre-cluster the fact by the dedup key: the broadcast join preserves
    # it and alias-aware output partitioning lets the final (order_id,
    # detail_seq) aggregation skip its exchange — one shuffle total, with
    # the join and partial agg running on all cores
    lineitem = ensure_parallelism(lineitem, by=("l_orderkey", "l_linenumber"))
    return _wide_from(orders, lineitem)


def _wide_from(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The join+merge+dedup core, agnostic to how the inputs were
    clustered (repartition in :func:`order_wide`, disk bucketing in
    :func:`bucketed_order_wide`)."""
    joined = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
    )
    wide = joined.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("detail_seq"),
        F.col("l_partkey").alias("sku_id"),
        F.col("l_extendedprice").alias("sku_price"),
        F.col("l_quantity").alias("sku_num"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_totalprice").alias("final_total_amount"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"),
        # per-detail amount: price×(1-discount); decimal cast makes the
        # value decimally exact so downstream sums are order-independent
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("final_detail_amount"),
    )
    # A5: unique per detail id.  The testdata's (orderkey, linenumber) is
    # NOT unique, so the dedup genuinely drops rows; ordering by every
    # varying output column makes the surviving row deterministic as a
    # multiset regardless of partitioning.
    return first_seen_dedup(
        wide,
        keys=["order_id", "detail_seq"],
        order_by=["sku_id", "sku_price", "sku_num", "final_detail_amount"],
    )


def bucketed_order_wide(
    spark,
    sf_dir: str,
    path: str,
    n_buckets: int = 8,
    tag: str = "demo",
) -> tuple[DataFrame, "callable"]:
    """Proof of the module docstring's 100 TB claim: write BOTH facts
    bucketed by the order key (``bucketBy`` + ``sortBy`` external tables
    under ``path``), re-run the SAME join+dedup core, and the fact⋈fact
    exchange disappears — each bucket pair joins in place, and the
    bucket partitioning (a hash partitioning on the order key) also
    satisfies the (order_id, detail_seq) dedup clustering, so the WHOLE
    plan is exchange-free (gated in tests/test_plan_shapes.py with
    broadcast disabled so the zero is the bucketing's, not a
    small-table accident).

    This is the write-once/join-forever layout: at 100 TB both fact
    tables pay one clustering write, then every order-keyed join, dedup,
    and rollup reads co-located buckets with zero shuffle.  Returns
    (result DataFrame, cleanup fn dropping the two catalog tables)."""
    from ..sources import load_table

    o_tbl, l_tbl = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    (
        load_table(spark, sf_dir, "orders")
        .write.bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{path}/{o_tbl}")
        .mode("overwrite")
        .saveAsTable(o_tbl)
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{path}/{l_tbl}")
        .mode("overwrite")
        .saveAsTable(l_tbl)
    )

    def cleanup() -> None:
        spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {l_tbl}")

    return _wide_from(spark.table(o_tbl), spark.table(l_tbl)), cleanup
