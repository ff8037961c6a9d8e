"""r14 — oracle output-type guard (the q41 HUGEINT class, VERDICT r13 #2).

Three rounds (r11-r13) of q41 driver-hash-red were caused by ONE uncast
DuckDB ``COUNT_IF`` (returns HUGEINT) widening the oracle's n1 column
through UNION type-unification — byte-identical values, divergent
representation under the driver's dtype-sensitive fetch (float64
``724270.0`` vs int64 ``724270``). These tests make that divergence
class unrepresentable:

1. every registered oracle must BIND (DuckDB planner) to output columns
   whose types are all inside ``DRIVER_SAFE_ORACLE_TYPES``;
2. ``compare_frames`` must flag an int-vs-float representation mismatch
   even when every value compares numerically equal;
3. the q41 oracle specifically binds n1/n2/n3 as BIGINT.

No Spark session needed — binding is planner-only, so the full 50-oracle
sweep runs in seconds.
"""

import pandas as pd
import pytest

from lakeflush_spark.testing import (
    DRIVER_SAFE_ORACLE_TYPES,
    compare_frames,
    duckdb_connection,
    oracle_type_problems,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


def test_every_oracle_binds_to_driver_safe_types(oracles, con):
    bad = {}
    for name, sql in sorted(oracles.items()):
        problems = oracle_type_problems(con, sql)
        if problems:
            bad[name] = problems
    assert not bad, f"oracles with driver-unsafe output types: {bad}"


def test_q41_oracle_n_columns_are_bigint(oracles, con):
    rel = con.sql(oracles["q41_wordcount_topk"])
    types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    assert types["n1"] == "BIGINT", types
    assert types["n2"] == "BIGINT", types
    assert types["n3"] == "BIGINT", types


def test_hugeint_oracle_is_rejected_by_type_guard(con):
    # COUNT_IF is exactly the construct that caused r11-r13; the guard
    # must name it without executing the query.
    problems = oracle_type_problems(
        con, "SELECT COUNT_IF(doc_id > 0) AS n1 FROM documents"
    )
    assert problems == ["n1: HUGEINT"]
    # and the cast repairs it
    assert not oracle_type_problems(
        con, "SELECT COUNT_IF(doc_id > 0)::BIGINT AS n1 FROM documents"
    )


def test_compare_frames_flags_int_vs_float_representation():
    # numerically equal, representationally divergent — the exact q41
    # failure shape (driver red, every value-canonical replay green).
    spark_pdf = pd.DataFrame({"k": ["a", "b"], "n1": pd.array([724270, 3], dtype="int64")})
    oracle_pdf = pd.DataFrame({"k": ["a", "b"], "n1": pd.array([724270.0, 3.0], dtype="float64")})
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert problems and "representation mismatch" in problems[0]
    # identical representations still pass
    assert not compare_frames(spark_pdf, spark_pdf.copy())


def test_driver_safe_set_is_the_empirical_seven():
    assert DRIVER_SAFE_ORACLE_TYPES == frozenset(
        {"BIGINT", "INTEGER", "VARCHAR", "DOUBLE", "DATE", "TIMESTAMP", "BOOLEAN"}
    )
