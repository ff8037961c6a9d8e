"""Z-order layout: Morton key correctness + real file-pruning effect."""

import pyspark.sql.functions as F
import pytest

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.layout import interleave_bits, zorder_write


def test_interleave_bits_morton_pattern(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x int, y int"
    )
    rows = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], 4).alias("z")
    ).collect()
    got = {(r.x, r.y): r.z for r in rows}

    def morton(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y)


def test_interleave_bits_width_guard():
    with pytest.raises(ValueError):
        interleave_bits([F.lit(1)] * 8, 8)


def test_zorder_key_degenerate_bounds(spark):
    from lakeflush_spark.operators.layout import zorder_key

    # all-NULL column: min/max aggregate to NULL -> constant, no crash
    df = spark.createDataFrame(
        [(1, None), (2, None)], "x int, y int"
    )
    _, key = zorder_key(df, ["x", "y"])
    assert df.select(key.alias("z")).count() == 2

    # empty frame: every bound NULL -> constant key
    empty = df.where("x < 0")
    _, key = zorder_key(empty, ["x", "y"])
    assert empty.select(key.alias("z")).count() == 0

    # non-numeric column: a clear error naming the column
    sdf = spark.createDataFrame([(1, "a")], "x int, s string")
    with pytest.raises(ValueError, match="'s'"):
        zorder_key(sdf, ["x", "s"])


def test_zorder_write_prunes_box_predicates(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 16
    flat = str(tmp_path / "flat")
    zed = str(tmp_path / "zed")
    # baseline: round-robin layout (no locality at all)
    li.repartition(n_files).write.mode("overwrite").parquet(flat)
    zorder_write(li, zed, ["l_orderkey", "l_partkey"], n_files=n_files)

    def files_hit(path):
        mx = spark.read.parquet(path).agg(
            F.max("l_orderkey").alias("ok"), F.max("l_partkey").alias("pk")
        ).collect()[0]
        pred = (F.col("l_orderkey") <= mx.ok / 10) & (F.col("l_partkey") <= mx.pk / 10)
        return (
            spark.read.parquet(path)
            .where(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    flat_hit, zed_hit = files_hit(flat), files_hit(zed)
    # same rows in both layouts
    assert (
        spark.read.parquet(zed).count()
        == spark.read.parquet(flat).count()
        == li.count()
    )
    # the box predicate's rows concentrate in a fraction of the
    # clustered files; a random layout spreads them everywhere
    assert zed_hit < flat_hit
    assert zed_hit <= n_files // 2
