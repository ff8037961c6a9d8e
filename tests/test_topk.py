"""grouped_top_k: the two-phase salted top-k must return EXACTLY the
naive single-window result (the guarantee is exact, not approximate),
while bounding every local window group well under the group size."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from lakeflush_spark.operators.topk import grouped_top_k


def _frame(spark, n=5000, groups=3):
    return spark.range(n).select(
        F.col("id").alias("item"),
        (F.col("id") % groups).cast("string").alias("grp"),
        # heavy ties: scores repeat every 17 items, so tie-breaking is
        # actually exercised
        (F.col("id") % 17).cast("double").alias("score"),
    )


def test_grouped_top_k_matches_naive_window(spark):
    df = _frame(spark)
    order = [F.desc("score"), F.asc("item")]
    for k in (1, 3, 25):
        for shards in (1, 4, 32):
            got = grouped_top_k(
                df, ["grp"], order, k, salt_cols=["item"], shards=shards
            )
            w = Window.partitionBy("grp").orderBy(*order)
            want = (
                df.withColumn("rank", F.row_number().over(w).cast("bigint"))
                .where(F.col("rank") <= k)
            )
            a = sorted((r.grp, r.rank, r.item, r.score) for r in got.collect())
            b = sorted((r.grp, r.rank, r.item, r.score) for r in want.collect())
            assert a == b, f"diverged at k={k}, shards={shards}"


def test_grouped_top_k_bounds_local_groups(spark):
    """Each (group, shard) window partition holds ~n/(groups*shards)
    rows — never a whole group."""
    df = _frame(spark, n=4096, groups=2)
    shards = 32
    salt = F.pmod(F.xxhash64(F.col("item")), F.lit(shards))
    sizes = [
        r["cnt"]
        for r in df.withColumn("_s", salt)
        .groupBy("grp", "_s")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    assert len(sizes) == 2 * shards  # xxhash64 spreads across all shards
    assert max(sizes) < 3 * 4096 / (2 * shards)


def test_global_row_number_matches_naive_window(spark):
    """Sharded global row_number must equal the single-window form for
    any shard count, including heavy ties on the leading order col and
    a degenerate one-shard bucketing."""
    from lakeflush_spark.operators.topk import global_row_number

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("item"),
        # leading order col with heavy ties (125 distinct values)
        (F.col("id") % 125).cast("long").alias("key"),
    )
    order = [F.asc("key"), F.asc("item")]
    w = Window.orderBy(*order)
    want = sorted(
        (r.key, r.item, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w).cast("bigint")).collect()
    )
    for shards in (1, 7, 64):
        # width-bucket of the LEADING order col: monotone, so shard
        # boundaries only cut between key-distinct rows
        sharded = df.withColumn(
            "_sh", F.floor(F.col("key") * shards / F.lit(125)).cast("int")
        )
        got = sorted(
            (r.key, r.item, r.rn)
            for r in global_row_number(sharded, order, "_sh").drop("_sh").collect()
        )
        assert got == want, f"diverged at shards={shards}"


def test_global_row_number_bounds_window_partitions(spark):
    """No window partition holds more than ~n/shards rows — the naive
    global window would put all n in one."""
    from lakeflush_spark.operators.topk import global_row_number

    n, shards = 8192, 32
    df = spark.range(n).select(
        F.col("id").alias("item"), F.col("id").cast("long").alias("key")
    ).withColumn("_sh", F.floor(F.col("key") * shards / F.lit(8192)).cast("int"))
    sizes = [
        r.cnt for r in df.groupBy("_sh").agg(F.count("*").alias("cnt")).collect()
    ]
    assert len(sizes) == shards
    assert max(sizes) <= n // shards + 1
    # and the operator still numbers all rows 1..n exactly once
    got = global_row_number(df, [F.asc("key"), F.asc("item")], "_sh")
    assert got.agg(
        F.count("*").alias("c"), F.min("rn").alias("mn"), F.max("rn").alias("mx"),
        F.countDistinct("rn").alias("d"),
    ).collect()[0] == (n, 1, n, n)


def test_global_ntile_matches_naive_window(spark):
    """Exact-arithmetic global ntile must equal F.ntile over the naive
    global window for divisible, remainder, and k>n cases."""
    from lakeflush_spark.operators.topk import global_ntile

    n = 1000
    df = spark.range(n).select(
        F.col("id").alias("item"), (F.col("id") % 37).cast("long").alias("key")
    ).withColumn("_sh", F.floor(F.col("key") * 8 / F.lit(37)).cast("int"))
    order = [F.asc("key"), F.asc("item")]
    for k in (1, 4, 7, 1500):
        w = Window.orderBy(*order)
        want = sorted(
            (r.item, r.tile)
            for r in df.withColumn("tile", F.ntile(k).over(w).cast("bigint")).collect()
        )
        got = sorted(
            (r.item, r.tile)
            for r in global_ntile(df, order, "_sh", k).drop("_sh").collect()
        )
        assert got == want, f"diverged at k={k}"


def test_grouped_top_k_validation(spark):
    import pytest

    df = _frame(spark, n=10)
    with pytest.raises(ValueError):
        grouped_top_k(df, ["grp"], [F.asc("item")], 0, salt_cols=["item"])
    with pytest.raises(ValueError):
        grouped_top_k(df, ["grp"], [F.asc("item")], 1, salt_cols=["item"], shards=0)
