"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the declared inventory from
``lakeflush_spark.plans`` (SURVEY.md §2.C). Every oracled entry is
hash-compared against DuckDB by the driver at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.plans import QUERIES

SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (TPC-H Q3 shape: 3-way join + agg + top-k)."""
    return QUERIES["q05_multiway_join_topk"].builder(spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
