"""Declared queries Q53-Q54 — the rest of the Python-function surface.

Q52 covers grouped-map ``applyInPandas``; these add the other two
rows of SURVEY §2.B's UDF/UDAF/UDTF checklist:

- Q53: a **Python UDTF** (table function, Spark 3.5+) exploding each
  order into per-bucket rows. Oracle twin is pure SQL (UNNEST-style
  generate), proving the UDTF path is value-identical to the
  declarative plan.
- Q54: a **pandas GROUPED_AGG UDAF** (Arrow-batched vectorized
  aggregate) beside the built-in twin inside one query.

Scale stance: both are escape hatches — Python rows cross Arrow, so
the built-in expression is always preferred when it exists (the oracle
twins here ARE those built-ins). The UDTF is lateral-join-shaped:
embarrassingly parallel, no shuffle beyond the final ORDER BY; the
UDAF shuffles once on the grouping key like any aggregate.
"""

# NO `from __future__ import annotations` here: it stringifies type
# hints module-wide, and pandas_udf resolves its signature from REAL
# pd.Series annotations at creation time.

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.plans.queries import _t, declare

# NOTE: @pandas_udf / @udtf decorators parse their DDL return type via
# the ACTIVE SparkContext — applying them at import time crashes any
# process that imports the plans package before creating a session
# (the grading driver does exactly that). All UDF objects here are
# created lazily inside the builders.


# ---------------------------------------------------------------------------
# Q53 — Python UDTF: price_buckets(total, n) emits one row per full
# 100k-bucket the order total crosses, with the running remainder.
# ---------------------------------------------------------------------------
class _PriceBuckets:
    def eval(self, total: float, step: float):
        b = 0
        left = float(total)
        step = float(step)  # SQL literals arrive as Decimal
        while left >= step and b < 10:
            b += 1
            left -= step
            yield b, round(left, 2)


#: deterministic demo slice: 1-in-20 orders by key go through the
#: Python UDTF; the rest take the JVM twin. Both compute bit-identical
#: values (all arithmetic is exact: 100000 and the 2-dp money totals
#: are both multiples of ulp(total), so repeated subtraction == b*step).
_Q53_DEMO_MOD = 20


@declare(
    "q53_python_udtf",
    """
    SELECT o.o_orderkey, g.bucket,
           ROUND(o.o_totalprice - g.bucket * 100000, 2) AS remainder
    FROM orders o,
         LATERAL (SELECT UNNEST(generate_series(1,
                    LEAST(10, FLOOR(o.o_totalprice / 100000)::INT))) AS bucket) g
    WHERE o.o_totalprice >= 100000
    ORDER BY o.o_orderkey, g.bucket
    """,
    "Lateral table-function explode of orders into price buckets, both "
    "ways in one frame: a live Python UDTF on a deterministic 1-in-20 "
    "slice (proves the UDTF surface) and the JVM sequence()+explode "
    "twin on the bulk (the production path — per-row Python lateral "
    "was the suite's scale-killer at 100x; r4 restructure). "
    "Value-identical to the SQL generate_series oracle.",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # NOT arrow-optimized: measured 2.1-2.6 s plain vs 12-13 s with
    # useArrow=True at sf0.1 (Spark 4.1 arrow-UDTF pays a per-call
    # pandas conversion that dwarfs pickling for tiny yields).
    spark.udtf.register(
        "price_buckets", udtf(_PriceBuckets, returnType="bucket int, remainder double")
    )
    # Pre-filter BEFORE the lateral: orders under one bucket yield zero
    # rows anyway, so the filter is semantics-preserving and keeps ~72%
    # of rows out of the expensive lateral (mirrors the oracle WHERE).
    orders = _t(spark, sf_dir, "orders").where("o_totalprice >= 100000")
    orders.where(F.pmod("o_orderkey", F.lit(_Q53_DEMO_MOD)) == 0).createOrReplaceTempView(
        "_q53_demo_orders"
    )
    demo = spark.sql(
        """
        SELECT o.o_orderkey, b.bucket, b.remainder
        FROM _q53_demo_orders o,
             LATERAL price_buckets(o.o_totalprice, 100000.0) b
        """
    )
    bulk = (
        orders.where(F.pmod("o_orderkey", F.lit(_Q53_DEMO_MOD)) != 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(10), F.floor(F.col("o_totalprice") / 100000).cast("int")),
                )
            ).alias("bucket"),
        )
        .select(
            "o_orderkey",
            "bucket",
            F.round(F.col("o_totalprice") - F.col("bucket") * 100000, 2).alias("remainder"),
        )
    )
    return demo.unionByName(bulk).orderBy("o_orderkey", "bucket")


# ---------------------------------------------------------------------------
# Q54 — pandas GROUPED_AGG UDAF: vectorized weighted-average discount
# per return flag, beside the built-in expression computing the same
# thing (identical by construction => the oracle checks both).
# ---------------------------------------------------------------------------
def _make_wavg_udaf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wavg_discount(price: pd.Series, discount: pd.Series) -> float:
        return float((price * discount).sum() / price.sum())

    return _wavg_discount


@declare(
    "q54_pandas_udaf",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_discount) / SUM(l_extendedprice), 6)
             AS wavg_udaf,
           ROUND(SUM(l_extendedprice * l_discount) / SUM(l_extendedprice), 6)
             AS wavg_builtin
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "Arrow-batched pandas UDAF (weighted avg) agreeing with the built-in aggregate twin.",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark forbids mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg() — the two sides run as separate
    # aggregations joined on the (tiny, broadcast) group key.
    wavg = _make_wavg_udaf()
    li = _t(spark, sf_dir, "lineitem")
    udaf_side = li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_discount"), 6).alias("wavg_udaf")
    )
    builtin_side = li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")) / F.sum("l_extendedprice"),
            6,
        ).alias("wavg_builtin")
    )
    return udaf_side.join(F.broadcast(builtin_side), "l_returnflag").orderBy("l_returnflag")
