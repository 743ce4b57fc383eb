"""Scale-strategy gates: skew salting is bit-identical to the unsalted
form, and bucketed tables co-locate joins (no Exchange in the plan) —
the physical-layout story for 100 TB, asserted on the real plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallrealtime02_spark.operators.skew import salted_distinct_count, salted_join
from gmallrealtime02_spark.sources import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("s"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=4)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("s"))
    )
    p = {r.o_custkey: (r.n, round(r.s, 6)) for r in plain.collect()}
    s = {r.o_custkey: (r.n, round(r.s, 6)) for r in salted.collect()}
    assert p == s


def test_salted_distinct_count_matches_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.uniques
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("uniques"))
        .collect()
    }
    salted = {
        r.event_type: r.uniques
        for r in salted_distinct_count(e, ["event_type"], "user_id", 8).collect()
    }
    assert exact == salted


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both fact tables by the join key at write time removes
    the join exchange entirely — the at-scale layout for the recurring
    order⋈detail join (SURVEY §2.4 J4 scale note)."""
    db = "buckdb_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}/warehouse'")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(f"{db}.li_b")
        )
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(f"{db}.o_b")
        )
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            lib, ob = spark.table(f"{db}.li_b"), spark.table(f"{db}.o_b")
            joined = lib.join(ob, lib.l_orderkey == ob.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and it still computes the right thing
            expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
            assert joined.count() == expect
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
