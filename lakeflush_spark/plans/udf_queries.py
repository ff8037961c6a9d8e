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
    "Python UDTF (lateral table function) exploding orders into price buckets, "
    "value-identical to the SQL generate_series twin.",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # Arrow-optimized UDTF (Spark 3.5+): rows cross the Python boundary
    # in Arrow record batches instead of pickled one-at-a-time — the
    # per-row overhead was this suite's slowest query (~2.9 s of 21 s).
    spark.udtf.register(
        "price_buckets",
        udtf(_PriceBuckets, returnType="bucket int, remainder double", useArrow=True),
    )
    # Pre-filter BEFORE the lateral: orders under one bucket yield zero
    # rows from the UDTF anyway, so the filter is semantics-preserving
    # and keeps ~72% of rows out of the Python boundary (the expensive
    # part of this plan — mirrors the oracle's WHERE).
    _t(spark, sf_dir, "orders").where("o_totalprice >= 100000").createOrReplaceTempView(
        "_q53_orders"
    )
    return spark.sql(
        """
        SELECT o.o_orderkey, b.bucket, b.remainder
        FROM _q53_orders o,
             LATERAL price_buckets(o.o_totalprice, 100000.0) b
        ORDER BY o.o_orderkey, b.bucket
        """
    )


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
