"""functions/grid.py — the three renditions (Spark Column, DuckDB SQL,
driver Python) of the 1e-6 snap/edge recipe must agree bit-for-bit on
the same input doubles; that agreement IS the oracle-twin contract
q41's bm25/tfidf/dsir labels stand on.
"""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lakeflush_spark.functions.grid import (
    EDGE_BAND,
    py_edge_e6,
    py_snap_e6,
    sql_edge_e6,
    sql_snap_e6,
)


@given(
    st.floats(
        min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False
    )
)
@settings(max_examples=300, deadline=None)
def test_py_and_duckdb_snap_agree(x):
    con = duckdb.connect()
    got_snap, got_edge = con.execute(
        f"SELECT {sql_snap_e6('x')}, {sql_edge_e6('x')} "
        "FROM (SELECT CAST(? AS DOUBLE) AS x)",
        [x],
    ).fetchone()
    con.close()
    assert got_snap == py_snap_e6(x)
    assert bool(got_edge) == py_edge_e6(x)


def test_spark_snap_matches_py(spark):
    import pyspark.sql.functions as F

    from lakeflush_spark.functions.grid import edge_e6, snap_e6

    xs = [
        0.0, 1.0, -1.0, 0.5e-6, -0.5e-6, 1.2345678, -987.6543210123,
        math.log(2.0), -math.log(3.0) * 1000, 123456.789012,
        # exact half-grid points (the rounding boundary itself)
        2.5e-6, -2.5e-6, 7.5e-6,
        # within the edge band of a boundary
        2.5e-6 + 1e-10, 2.5e-6 - 1e-10,
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x double").select(
        "x", snap_e6(F.col("x")).alias("s"), edge_e6(F.col("x")).alias("e")
    )
    for r in df.collect():
        assert r.s == py_snap_e6(r.x), r.x
        assert r.e == py_edge_e6(r.x), r.x


def test_edge_band_guards_the_boundary():
    # a value whose *1e6 frac sits exactly at .5 must be edge-flagged;
    # a value 2 bands away must not
    assert py_edge_e6(2.5e-6)
    assert not py_edge_e6(2.5e-6 + 2 * EDGE_BAND / 1e6)
    # ulp-scale drift around a non-boundary value cannot flip the snap
    x = math.log(7.0)
    for drift in (0.0, 1e-15, -1e-15):
        assert py_snap_e6(x + drift) == py_snap_e6(x)


def test_sql_fragments_compose_in_expressions():
    con = duckdb.connect()
    # splice over a computed expression (the real usage shape:
    # ln(col + 1.0) inside an aggregate)
    got = con.execute(
        f"SELECT SUM({sql_snap_e6('ln(v + 1.0)')}) FROM "
        "(SELECT unnest([1, 2, 3, 10]) AS v)"
    ).fetchone()[0]
    con.close()
    want = sum(py_snap_e6(math.log(v + 1.0)) for v in (1, 2, 3, 10))
    assert got == want


@pytest.mark.parametrize("x", [0.4999999999, 0.5000000001, -0.4999999999])
def test_half_up_is_floor_based_not_bankers(x):
    # floor(x*1e6 + 0.5): ties round UP (toward +inf), never to-even —
    # identical on both engines because both use the same floor form
    assert py_snap_e6(x) == math.floor(x * 1e6 + 0.5)
