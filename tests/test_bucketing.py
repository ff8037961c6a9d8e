"""Bucketed tables: shuffle-free co-located joins.

The 100 TB story for repeated big-big joins: pay the shuffle ONCE at
write time (`bucketBy` on the join key), then every subsequent join
on that key is exchange-free — both scans are already hash-partitioned
identically. This test proves the property mechanically by asserting
the executed join plan contains no shuffle exchange.
"""

import pyspark.sql.functions as F

from lakeflush_spark.io import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "b_orders"))
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        cust.withColumnRenamed("c_custkey", "o_custkey")
        .write.mode("overwrite")
        .option("path", str(tmp_path / "b_customer"))
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_customer")
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")

    assert n == orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    assert "Exchange" not in plan, "bucketed join must be shuffle-free"
    assert "SortMergeJoin" in plan


def test_bucket_pruning_on_filter(spark, sf_dir, tmp_path):
    # Point lookups on the bucket key read 1 of N buckets.
    orders = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS bp_orders")
    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "bp_orders"))
        .bucketBy(8, "o_custkey")
        .saveAsTable("bp_orders")
    )
    # the planner auto-disables bucketed scans when no operator needs
    # the distribution; forcing it shows filter-time bucket pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table("bp_orders").where(F.col("o_custkey") == 7)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS bp_orders")
