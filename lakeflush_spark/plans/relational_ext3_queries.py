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
# Q51 — approximate distinct (HLL++). Engine-specific sketches differ
# across implementations, so there is no value-exact oracle: declared
# rows-only (weak check), with the exact count carried alongside so the
# result is self-validating (|approx - exact| / exact <= 5% asserted in
# tests). At 100 TB approx_count_distinct is THE distinct-count path —
# fixed-size mergeable sketch vs a full shuffle of distinct values.
# ---------------------------------------------------------------------------
@declare(
    "q51_approx_distinct",
    None,  # sketches are engine-specific; rows-only driver check
    "HLL++ approximate distinct customers per segment beside the exact count.",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.approx_count_distinct("c_custkey", 0.02).alias("approx_cust"),
            F.countDistinct("c_custkey").alias("exact_cust"),
        )
        .orderBy("c_mktsegment")
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
    # Bucket customers ~256 ways: every bucket holds ALL rows of each
    # of its customers (hash partitioning by customer), so per-customer
    # stats stay exact while Arrow/Python overhead is paid per bucket,
    # not per customer.
    bucketed = orders.withColumn("_b", F.pmod(F.hash("o_custkey"), F.lit(256)))
    return (
        bucketed.groupBy("_b")
        .applyInPandas(lambda pdf: _zscore_bucket(pdf), schema=_Q52_SCHEMA)
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q56 — SLIDING window aggregation (width 1h, slide 30m): every event
# belongs to exactly width/slide = 2 overlapping windows. Streaming twin
# runs the same expression incrementally with a watermark. Oracle
# expands the assignment explicitly (bucket by slide, shift k slides).
# Scale: one shuffle on window_start; state size in streaming mode is
# bounded by (active windows × groups), controlled by the watermark.
# ---------------------------------------------------------------------------
@declare(
    "q56_sliding_window",
    """
    SELECT window_start, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - k.k * INTERVAL '30 minutes' AS window_start, value
      FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
    )
    GROUP BY window_start
    ORDER BY window_start
    """,
    "Sliding 1h/30m window aggregation; each event feeds 2 overlapping windows.",
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "cnt", "sum_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Q57 — MAP-typed scalar functions: build a map column, extract by key,
# cardinality, sorted key list. Map-only projection (no shuffle beyond
# the final ORDER BY); completes §2.B's scalar-function row (string/
# date/math/array/json covered by Q13/Q41/Q46).
# DuckDB map_extract returns a LIST -> [1]; Spark element_at returns
# the value directly. The key list is serialized to a string because
# the driver's value-hash comparator requires hashable (scalar) cells.
# ---------------------------------------------------------------------------
@declare(
    "q57_map_functions",
    """
    SELECT p_partkey,
           map_extract(MAP(['brand','type'], [p_brand, p_type]), 'brand')[1]
             AS brand_val,
           CAST(cardinality(MAP(['brand','type'], [p_brand, p_type])) AS BIGINT)
             AS n_keys,
           array_to_string(list_sort(map_keys(MAP(['brand','type'], [p_brand, p_type]))), ',')
             AS keys_sorted
    FROM part
    ORDER BY p_partkey
    """,
    "MAP column build/extract/cardinality/keys over part, value-exact both engines.",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.element_at(m, "brand").alias("brand_val"),
            F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        )
        .orderBy("p_partkey")
    )
