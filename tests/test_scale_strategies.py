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


def test_dt_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """The serving-table layout (dt-partitioned parquet, the ES-daily-index
    replacement) must partition-prune: a dt filter reaches the scan as a
    PartitionFilter, so a day query touches one directory regardless of
    table size."""
    from pyspark.sql import functions as F

    from gmallrealtime02_spark.sources import load_table

    tgt = str(tmp_path / "dau_serving")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.date_format("ts", "yyyy-MM-dd").alias("dt")
    )
    e.write.partitionBy("dt").mode("overwrite").parquet(tgt)

    one_day = e.select("dt").distinct().orderBy("dt").first().dt
    q = spark.read.parquet(tgt).filter(F.col("dt") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and f"isnotnull(dt" in m[0], plan
    # pruned scan reads exactly the rows of that day
    expect = e.filter(F.col("dt") == one_day).count()
    assert q.count() == expect


def test_streaming_dedup_on_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state path: the same watermarked dedup runs unchanged on
    the RocksDB state store provider (disk-backed, bounded-heap — the
    provider a real cluster uses instead of the default in-memory
    HDFS-backed store)."""
    import os

    from pyspark.sql import types as T

    from gmallrealtime02_spark.streaming import jobs as SJ

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    from datetime import datetime

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    rows1 = [(1, datetime(2024, 1, 1, 0), 1, "click", 1.0),
             (2, datetime(2024, 1, 1, 1), 2, "click", 1.0)]
    rows2 = [(3, datetime(2024, 1, 1, 2), 1, "click", 1.0)]  # dup user 1, day 1
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/b0")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/b1")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        dau = SJ.streaming_dau(stream)
        q = (
            dau.writeStream.outputMode("append")
            .format("memory")
            .queryName("rocksdb_dau")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r.dt, r.mid)
                for r in spark.sql("SELECT * FROM rocksdb_dau").collect()
            }
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert got == {("2024-01-01", 1), ("2024-01-01", 2)}

