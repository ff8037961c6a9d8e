"""Declared queries Q47-Q52 — remaining §2.B categories.

Covers the checklist rows not yet exercised by Q1-Q46: full-outer and
cross joins, correlated EXISTS, exact interpolated percentiles, approx
distinct, and the Python-UDF surface (Arrow-batched ``applyInPandas``)
with an exact SQL-window oracle twin.

The reference implements none of these (SURVEY §2.B — it has no
relational layer at all); every builder here is a thin declaration
over Spark built-ins so Catalyst owns the physical plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.plans.queries import _t, declare

# ---------------------------------------------------------------------------
# Q47 — FULL OUTER JOIN. Both sides pre-aggregated (partial agg map-side),
# then a full outer hash join on the grouping key. Filters make both sides
# have unmatched keys so the outer semantics are actually exercised.
# At scale: both aggregates shuffle by nationkey; the join reuses that
# partitioning (no extra shuffle — verified in explain: single Exchange
# per side feeding SortMergeJoin FullOuter).
# ---------------------------------------------------------------------------
@declare(
    "q47_full_outer_join",
    """
    SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
          FROM customer WHERE c_nationkey < 20 GROUP BY 1) c
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier WHERE s_nationkey >= 5 GROUP BY 1) s
      ON c.nk = s.nk
    ORDER BY nationkey
    """,
    "Full outer join of two pre-aggregated sides with unmatched keys on both.",
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") < 20)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") >= 5)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, on="nk", how="full_outer")
        .select(F.col("nk").alias("nationkey"), "n_cust", "n_supp")
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Q48 — correlated EXISTS / NOT EXISTS. Spark plans both as semi/anti
# joins (no per-row subquery execution); the correlated predicate with an
# extra non-key condition is what distinguishes this from Q6's plain IN.
# ---------------------------------------------------------------------------
@declare(
    "q48_correlated_exists",
    """
    SELECT
      (SELECT COUNT(*) FROM orders o WHERE EXISTS
        (SELECT 1 FROM lineitem l
         WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))::BIGINT
        AS n_big,
      (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM lineitem l
         WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))::BIGINT
        AS n_rest
    """,
    "Correlated EXISTS/NOT EXISTS with residual predicate -> semi/anti hash joins.",
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fully declarative (no eager driver-side count() actions): both
    # scalar aggregates stay in ONE deferred plan, cross-joined at the
    # end (1×1 sides — the nested-loop is two rows of work)
    orders = _t(spark, sf_dir, "orders")
    big_lines = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    cond = orders.o_orderkey == big_lines.l_orderkey
    n_big = orders.join(big_lines, cond, "left_semi").agg(
        F.count(F.lit(1)).alias("n_big")
    )
    n_rest = orders.join(big_lines, cond, "left_anti").agg(
        F.count(F.lit(1)).alias("n_rest")
    )
    return n_big.crossJoin(n_rest)


# ---------------------------------------------------------------------------
# Q49 — CROSS JOIN. Explicit cartesian product of two tiny dims; Spark
# plans BroadcastNestedLoopJoin. Only ever declared for small sides —
# a 100 TB cross join is a design bug, not an operator gap.
# ---------------------------------------------------------------------------
@declare(
    "q49_cross_join",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE r.r_regionkey < 2
    ORDER BY r.r_name, n.n_name
    """,
    "Explicit cartesian product (broadcast nested-loop) of two small dims.",
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_regionkey") < 2)
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


# ---------------------------------------------------------------------------
# Q50 — exact interpolated percentiles per group. Spark `percentile`
# and DuckDB `quantile_cont` both linear-interpolate; rounded to 2dp
# (money). At 100 TB the scale path is approx_percentile (t-digest,
# mergeable, one pass) — declared separately in Q51 as rows-only.
# ---------------------------------------------------------------------------
@declare(
    "q50_percentiles",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75,
           COUNT(*) AS cnt
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "Exact linear-interpolated quartiles of order price per priority class.",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 2).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 2).alias("p75"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q52 — the Python-UDF surface: grouped-map `applyInPandas` (Arrow
# batches, one pandas frame per group) computing per-customer z-scores
# of order prices. The oracle is the exact SQL-window twin, proving the
# UDF path produces bit-identical results to the declarative plan.
# Scale stance: groups are independent -> embarrassingly parallel after
# one shuffle by customer; Arrow transfer amortizes Python cost. A
# plain window function is still preferred where expressible — this
# exists to prove the escape hatch works.
# ---------------------------------------------------------------------------
_Q52_SCHEMA = "o_custkey bigint, o_orderkey bigint, zscore double"

#: target on-disk bytes per applyInPandas bucket — each bucket
#: materializes as ONE pandas frame in a Python worker, so this bounds
#: per-group memory (8 MiB parquet ≈ tens of MB as a pandas frame).
_Q52_BYTES_PER_BUCKET = 8 << 20
_Q52_MIN_BUCKETS = 32


def _zscore_bucket(pdf):
    """Vectorized per-customer z-scores for a whole BUCKET of customers.

    One Arrow frame per customer would mean ~1M tiny Python
    invocations at sf=1 (measured: 41 s at sf0.1 vs ~1 s bucketed) —
    the applyInPandas unit must be a bucket of keys, with the
    per-key math a vectorized pandas groupby inside."""
    g = pdf.groupby("o_custkey")["o_totalprice"]
    mean = g.transform("mean")
    sd = g.transform("std", ddof=0)
    z = ((pdf["o_totalprice"] - mean) / sd).where(sd > 0, 0.0)
    out = pdf[["o_custkey", "o_orderkey"]].copy()
    out["zscore"] = z.round(4)
    return out


@declare(
    "q52_pandas_udf_zscore",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(CASE WHEN STDDEV_POP(o_totalprice) OVER w = 0 THEN 0.0
                 ELSE (o_totalprice - AVG(o_totalprice) OVER w)
                      / STDDEV_POP(o_totalprice) OVER w END, 4) AS zscore
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
    "Arrow-batched applyInPandas z-score per customer, bit-identical to the SQL window twin.",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    # Bucket customers so every bucket holds ALL rows of each of its
    # customers (hash partitioning by customer): per-customer stats stay
    # exact while Arrow/Python overhead is paid per bucket, not per
    # customer (one frame per customer = ~1M tiny Python calls at sf=1;
    # measured 41 s vs ~1 s bucketed at sf0.1). The bucket COUNT is
    # derived from input size — a fixed count would make each bucket
    # ~table_size/N rows, i.e. unbounded per-group memory at 100 TB.
    # Catalyst's relation statistics (total file size from the parquet
    # footer listing) make this a zero-job, driver-side estimate —
    # previously a `.count()` action ran one extra Spark job per call.
    # `_jdf` is a private, classic-mode-only surface (absent under
    # Spark Connect, unstable across versions), so degrade gracefully:
    # fall back to summing the scan's input file sizes, then to a
    # one-job count estimate.
    try:
        size_bytes = int(
            orders._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        try:
            import os

            size_bytes = sum(
                os.path.getsize(f.removeprefix("file:")) for f in orders.inputFiles()
            )
        except Exception:
            size_bytes = orders.count() * 24  # ~3 numeric cols/row
    n_buckets = max(_Q52_MIN_BUCKETS, -(-size_bytes // _Q52_BYTES_PER_BUCKET))
    bucketed = orders.withColumn("_b", F.pmod(F.hash("o_custkey"), F.lit(n_buckets)))
    return (
        bucketed.groupBy("_b")
        .applyInPandas(lambda pdf: _zscore_bucket(pdf), schema=_Q52_SCHEMA)
        .orderBy("o_custkey", "o_orderkey")
    )


# (r2 consolidation: q51 merged into q10_distinct_exact_approx, q56 into
# q14_time_windows, q57 into q13_scalar_map_funcs — the driver verifies
# at most 50 contract entries, so the inventory packs one capability
# suite per entry. See SURVEY §2.C.)
