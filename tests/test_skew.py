"""salted_join: result-identical to the plain join on skewed data."""

import pyspark.sql.functions as F

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.skew import salted_join


def _skewed_orders(spark, sf_dir):
    # hammer one hot key: 80% of rows get custkey 7
    orders = load_table(spark, sf_dir, "orders")
    return orders.withColumn(
        "o_custkey",
        F.when(F.pmod("o_orderkey", F.lit(5)) < 4, F.lit(7)).otherwise(
            F.col("o_custkey")
        ),
    )


def test_salted_inner_join_matches_plain(spark, sf_dir):
    orders = _skewed_orders(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey", "inner")
    salted = salted_join(orders, cust, "o_custkey", "inner", salt=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_matches_plain(spark, sf_dir):
    orders = _skewed_orders(spark, sf_dir)
    # dimension missing some keys -> unmatched left rows must survive
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 == 0)
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    plain = orders.join(cust, "o_custkey", "left")
    salted = salted_join(orders, cust, "o_custkey", "left", salt=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salt_spreads_hot_key(spark, sf_dir):
    orders = _skewed_orders(spark, sf_dir)
    salt_col = F.pmod(F.xxhash64(*orders.columns), F.lit(8)).cast("int")
    n_buckets = (
        orders.where(F.col("o_custkey") == 7)
        .select(salt_col.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets >= 6, "hot key rows spread over (nearly) all salt buckets"
