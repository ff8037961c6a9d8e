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


def test_grouped_top_k_validation(spark):
    import pytest

    df = _frame(spark, n=10)
    with pytest.raises(ValueError):
        grouped_top_k(df, ["grp"], [F.asc("item")], 0, salt_cols=["item"])
    with pytest.raises(ValueError):
        grouped_top_k(df, ["grp"], [F.asc("item")], 1, salt_cols=["item"], shards=0)
