"""Declared query inventory (SURVEY.md §2.C) — the t2 correctness contract.

Every entry pairs an idiomatic-Spark DataFrame builder with the
equivalent ANSI SQL that DuckDB runs as the oracle. Conventions that
make the oracle hash-match deterministic (SURVEY §7.3.5):

- every aggregate / computed column is aliased IDENTICALLY on both
  sides;
- every float aggregate is ``round()``-ed on both sides (parallel
  double summation is order-dependent in the last bits);
- integer-kind computed columns are cast to BIGINT on both sides
  (Spark ``row_number`` is int32, DuckDB's is int64);
- every query ends in an explicit total-order ORDER BY.

Scale notes (the 100 TB stance) are in each builder's docstring: which
side broadcasts, where the shuffles are, and what AQE is expected to do.
Reference parity pointers cite ``/root/reference`` file:line.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from lakeflush_spark.io import load_table


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    description: str = ""


QUERIES: dict[str, DeclaredQuery] = {}


def declare(name: str, oracle: str | None, description: str = ""):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = DeclaredQuery(name, fn, oracle, description)
        return fn

    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q1 — scan + count (reference analog: O1 recursive scan + O4 whole-file read,
# utils/file/processor.py:9-118)
# ---------------------------------------------------------------------------
@declare(
    "q01_scan_count",
    "SELECT COUNT(*) AS cnt FROM lineitem",
    "Full-scan count. Parquet footer row counts let Spark answer this without reading data pages.",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# Q2 — filter + project (reference analog: O3 glob filter,
# utils/file/processor.py:38-50). Predicate + projection both push into the
# parquet scan (verified via explain: PushedFilters / ReadSchema).
# ---------------------------------------------------------------------------
@declare(
    "q02_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ORDER BY l_orderkey, l_linenumber
    """,
    "Pushed-down filter + pruned projection; scan reads 4 of 11 columns.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Q3 — hash aggregate, TPC-H Q1 shape. Catalyst plans partial (map-side)
# + final HashAggregate automatically; only the 6-group final agg shuffles.
# ---------------------------------------------------------------------------
@declare(
    "q03_hash_agg",
    """
    SELECT l_returnflag, l_linestatus,
           round(SUM(l_quantity), 2)                         AS sum_qty,
           round(SUM(l_extendedprice), 2)                    AS sum_base_price,
           round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(AVG(l_quantity), 4)                         AS avg_qty,
           round(AVG(l_discount), 4)                         AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1: map-side partial agg means the shuffle carries 6 rows/partition, not 600k.",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q4 — equi join with broadcast dim. nation is 25 rows at EVERY scale factor
# (TPC-H fixes it), so broadcasting is correct at 100 TB too: no shuffle of
# the fact side at all, just a map-side hash join.
# ---------------------------------------------------------------------------
@declare(
    "q04_broadcast_join",
    """
    SELECT n_name, COUNT(*) AS cnt
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    "Broadcast-hash join: the 25-row dim ships to executors; customer never shuffles for the join.",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Q5 — multi-way join + agg + top-k, TPC-H Q3 shape. Filters applied BEFORE
# the joins (Catalyst pushes them below anyway); customer⋈orders is the
# selective side, then joined to lineitem on the orderkey. At scale AQE
# converts the orders-side join to broadcast if the filtered side is small.
# ---------------------------------------------------------------------------
@declare(
    "q05_multiway_join_topk",
    """
    SELECT l_orderkey,
           round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3: selective dims first, AQE re-plans the second join to broadcast when the filtered build side shrinks.",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q6 — semi / anti joins. left_semi never materializes the right side's
# columns, and Spark de-dups the build side — exactly IN-subquery semantics.
# ---------------------------------------------------------------------------
@declare(
    "q06_semi_anti_join",
    """
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders))::BIGINT AS n_semi,
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN
         (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL))::BIGINT AS n_anti
    """,
    "left_semi + left_anti joins in one deferred plan: semi never shuffles "
    "payload columns (build side deduplicated); anti gives NOT-EXISTS "
    "semantics on non-null keys. (r2: merged q06+q06b.)",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey").where(F.col("o_custkey").isNotNull())
    cond = cust.c_custkey == orders.o_custkey
    n_semi = cust.join(orders, cond, "left_semi").agg(F.count(F.lit(1)).alias("n_semi"))
    n_anti = cust.join(orders, cond, "left_anti").agg(F.count(F.lit(1)).alias("n_anti"))
    return n_semi.crossJoin(n_anti)


# ---------------------------------------------------------------------------
# Q7 — sort + limit (top-k). Spark plans TakeOrderedAndProject: each
# partition keeps its local top-100, only k rows per partition reach the
# driver — no global sort at any scale.
# ---------------------------------------------------------------------------
@declare(
    "q07_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    "TakeOrderedAndProject: per-partition heap of k, no full shuffle sort.",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q8 — window ranking: per-nation top-3 customers by order revenue. The agg
# shuffles on (n_name, c_custkey); the window re-shuffles on n_name only —
# 25 partitions, so the rank step is trivially parallel and skew-free.
# ---------------------------------------------------------------------------
@declare(
    "q08_window_rank",
    """
    WITH totals AS (
        SELECT n_name, c_custkey, round(SUM(o_totalprice), 2) AS total
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        GROUP BY n_name, c_custkey
    )
    SELECT n_name, c_custkey, total, rn FROM (
        SELECT n_name, c_custkey, total,
               CAST(row_number() OVER (PARTITION BY n_name ORDER BY total DESC, c_custkey) AS BIGINT) AS rn
        FROM totals
    ) ranked
    WHERE rn <= 3
    ORDER BY n_name, rn
    """,
    "Grouped top-k via row_number window over a pre-aggregated frame.",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    totals = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    # two-phase grouped top-k (operators/topk.py): nation has 25
    # values, so a plain partitionBy(n_name) window would sort an
    # entire nation's customers in ONE task at scale; the salted
    # local-top-3 + tiny global re-rank is value-identical.
    from lakeflush_spark.operators.topk import grouped_top_k

    return grouped_top_k(
        totals,
        group_cols=["n_name"],
        order_cols=[F.desc("total"), F.asc("c_custkey")],
        k=3,
        salt_cols=["c_custkey"],
        rank_col="rn",
    ).orderBy("n_name", "rn")


# ---------------------------------------------------------------------------
# Q9 — analytic window frame: running revenue per customer. Single shuffle
# on o_custkey; frame is ROWS UNBOUNDED PRECEDING..CURRENT ROW so the
# running state is O(1) per row.
# ---------------------------------------------------------------------------
@declare(
    "q09_window_running_sum",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "Running-sum analytic frame; one shuffle, sequential in-partition scan.",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q10 — exact + approximate distinct counts per segment. Exact runs a
# partial distinct on mappers; approx is HLL++ (fixed-size mergeable
# sketch — THE distinct path at 100 TB, where exact distinct means
# shuffling every distinct value). Sketch estimates are engine-specific,
# so the contract surfaces a TOLERANCE VERDICT (|approx-exact| <= 5%)
# instead of the raw estimate: the oracle asserts TRUE per group, which
# hash-verifies the sketch's accuracy without demanding bit-equality.
# (r2: merged q10+q51.)
# ---------------------------------------------------------------------------
@declare(
    "q10_distinct_exact_approx",
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_cust,
           TRUE AS approx_ok
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "Exact distinct per segment beside an HLL++ 5%-tolerance verdict "
    "(approx_count_distinct rsd=0.01); the scale path is the sketch.",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("exact_cust"),
            F.approx_count_distinct("c_custkey", 0.01).alias("_approx"),
        )
        .select(
            "c_mktsegment",
            "exact_cust",
            (
                F.abs(F.col("_approx") - F.col("exact_cust"))
                <= 0.05 * F.col("exact_cust")
            ).alias("approx_ok"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Q11 — rollup. Spark expands grouping sets in a single pass (Expand node),
# one shuffle for all three grouping levels.
# ---------------------------------------------------------------------------
@declare(
    "q11_rollup",
    """
    SELECT n_name, c_mktsegment, COUNT(*) AS cnt
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, c_mktsegment)
    ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST, cnt
    """,
    "ROLLUP via Expand: 3 grouping levels, one shuffle.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — the full set-operation family in one labeled frame: INTERSECT
# and EXCEPT (DISTINCT-semantics in ANSI; Spark's intersect()/subtract()
# match exactly) plus UNION ALL (zero-shuffle concatenation) counted per
# source. Each arm keeps its own natural shuffle: intersect/except
# hash-partition on the key, union-all's only exchange is the group-by.
# (r2: merged q12+q12b+q44.)
# ---------------------------------------------------------------------------
@declare(
    "q12_set_ops",
    """
    SELECT op, key, cnt FROM (
        SELECT 'intersect' AS op, nationkey AS key, 0::BIGINT AS cnt FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT 'except' AS op, orderkey AS key, 0::BIGINT AS cnt FROM (
            SELECT o_orderkey AS orderkey FROM orders
            EXCEPT
            SELECT l_orderkey FROM lineitem
        )
        UNION ALL
        SELECT 'union_all:' || src AS op, nationkey AS key, COUNT(*) AS cnt
        FROM (
            SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
        )
        GROUP BY nationkey, src
    )
    ORDER BY op, key
    """,
    "INTERSECT / EXCEPT / UNION-ALL suite as one labeled frame "
    "(EXCEPT arm is non-empty: orders with no lineitems exist).",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    zero = F.lit(0).cast("bigint")
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("key"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("key"))
    inter = c.intersect(s).select(F.lit("intersect").alias("op"), "key", zero.alias("cnt"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("key"))
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("key"))
    exc = o.subtract(li).select(F.lit("except").alias("op"), "key", zero.alias("cnt"))
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("key"), F.lit("customer").alias("src")
    )
    su = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("key"), F.lit("supplier").alias("src")
    )
    uni = (
        cu.unionByName(su)
        .groupBy("key", "src")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.concat(F.lit("union_all:"), F.col("src")).alias("op"), "key", "cnt")
    )
    return inter.unionByName(exc).unionByName(uni).orderBy("op", "key")


# ---------------------------------------------------------------------------
# Q13 — scalar functions: string/regex/math plus the MAP-typed family
# (build, extract-by-key, cardinality, sorted key list). All JVM-side
# built-ins: stays inside whole-stage codegen, zero Python in the row
# path. DuckDB map_extract returns a LIST -> [1]; Spark element_at
# returns the value directly; the key list serializes to a string
# because the driver's value-hash comparator needs scalar cells.
# (r2: merged q13+q57.)
# ---------------------------------------------------------------------------
@declare(
    "q13_scalar_map_funcs",
    r"""
    SELECT p_partkey,
           substring(p_name, 1, 5)                  AS name5,
           upper(p_brand)                           AS brand_u,
           regexp_extract(p_type, '^(\w+)', 1)      AS type_head,
           round(p_retailprice, 1)                  AS price_r,
           map_extract(MAP(['brand','type'], [p_brand, p_type]), 'brand')[1]
             AS brand_val,
           CAST(cardinality(MAP(['brand','type'], [p_brand, p_type])) AS BIGINT)
             AS n_keys,
           array_to_string(list_sort(map_keys(MAP(['brand','type'], [p_brand, p_type]))), ',')
             AS keys_sorted
    FROM part
    ORDER BY p_partkey
    """,
    "String/regex/math + MAP scalar functions, all codegen'd.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.substring("p_name", 1, 5).alias("name5"),
            F.upper("p_brand").alias("brand_u"),
            F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
            F.round("p_retailprice", 1).alias("price_r"),
            F.element_at(m, "brand").alias("brand_val"),
            F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        )
        .orderBy("p_partkey")
    )


@declare(
    "q13b_scalar_datetime",
    """
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(year(o_orderdate) AS BIGINT)  AS order_year,
           round(o_totalprice, 1)           AS price_r
    FROM orders
    ORDER BY o_orderkey
    """,
    "Datetime scalar functions (date_trunc / year).",
)
def q13b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.round("o_totalprice", 1).alias("price_r"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q14 — time-window aggregations over events, batch mode: TUMBLING (1h)
# and SLIDING (1h width, 30m slide — every event feeds exactly 2
# overlapping windows) as one labeled frame. F.window == DuckDB
# time_bucket for aligned tumbles; the sliding oracle expands the
# window assignment explicitly (bucket by slide, shift k slides). The
# streaming twins run the same expressions incrementally with a
# watermark (q35 and streaming/events.py); sliding state is bounded by
# (active windows x groups). (r2: merged q14+q56.)
# ---------------------------------------------------------------------------
@declare(
    "q14_time_windows",
    """
    SELECT kind, window_start, cnt, sum_value FROM (
        SELECT 'tumbling' AS kind,
               time_bucket(INTERVAL '1 hour', ts) AS window_start,
               COUNT(*) AS cnt,
               round(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 2
        UNION ALL
        SELECT 'sliding' AS kind, window_start, COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS sum_value
        FROM (
          SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - k.k * INTERVAL '30 minutes' AS window_start, value
          FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
        )
        GROUP BY window_start
    )
    ORDER BY kind, window_start
    """,
    "Tumbling 1h + sliding 1h/30m window aggregations, labeled by kind.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scan + ONE shuffle for both kinds: the hour-aligned sliding
    # windows ARE the tumbling windows (width 1h, slide 30m -> starts at
    # :00 and :30; a window starting on the hour covers exactly the
    # tumbling bucket). So aggregate the sliding windows once, then
    # explode each :00-start result row into both kind labels — the
    # fan-out runs on the tiny aggregated output, not the event stream.
    # (A union of two aggs would scan events twice: Catalyst pushes the
    # minute filter below the aggregate, breaking exchange reuse.)
    ev = _t(spark, sf_dir, "events")
    slide = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "cnt", "sum_value")
    )
    kinds = F.when(
        F.minute("window_start") == 0,
        F.array(F.lit("sliding"), F.lit("tumbling")),
    ).otherwise(F.array(F.lit("sliding")))
    return slide.select(
        F.explode(kinds).alias("kind"), "window_start", "cnt", "sum_value"
    ).orderBy("kind", "window_start")


# ---------------------------------------------------------------------------
# Q15 — dedup semantics over events (batch equivalent of dropDuplicates
# within watermark).
# ---------------------------------------------------------------------------
@declare(
    "q15_event_dedup",
    "SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS distinct_events FROM events",
    "dropDuplicates on the event id — batch equivalent of streaming dedup-within-watermark.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("distinct_events"))
    )
