"""DuckDB-oracle comparison harness (mirrors the driver's t2 gate).

Runs a declared Spark query and its oracle SQL side-by-side on the
same parquet tables and compares row count, column names, and an
order-insensitive value frame (columns sorted by name, rows sorted by
all columns) — the same shape the driver hashes.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from lakeflush_spark.io import TABLES, table_path


# r14 (VERDICT r13 #2): the only driver-safe DuckDB output types. Every
# type in this set is empirically driver-hash-green across r1-r13; the
# one excursion outside it (q41's uncast COUNT_IF -> HUGEINT, r11-r13)
# produced three rounds of hash-red with byte-identical values, because
# the driver fetches dtype-sensitively (HUGEINT -> float64 '724270.0'
# vs Spark int64 '724270'). Oracles must bind to these types ONLY.
DRIVER_SAFE_ORACLE_TYPES = frozenset(
    {"BIGINT", "INTEGER", "VARCHAR", "DOUBLE", "DATE", "TIMESTAMP", "BOOLEAN"}
)


def oracle_type_problems(
    con: duckdb.DuckDBPyConnection, sql: str
) -> list[str]:
    """Bind (not execute) an oracle and flag output columns whose DuckDB
    type is outside DRIVER_SAFE_ORACLE_TYPES. Binding is enough: types
    come from the planner, so this is cheap even for the big CTE suites.
    """
    rel = con.sql(sql)
    return [
        f"{c}: {t}"
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if t not in DRIVER_SAFE_ORACLE_TYPES
    ]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            out[c] = pd.to_datetime(col).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.astype("int64")
        elif pd.api.types.is_float_dtype(col):
            out[c] = col.astype("float64")
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    # r14 (VERDICT r13 #2): dtype-sensitive check. The driver hashes a
    # rendered/typed fetch, so an int64-vs-float64 divergence (e.g. an
    # uncast DuckDB COUNT_IF widening a union column to HUGEINT) fails
    # at the driver even when every value compares equal numerically.
    # Flag any numeric-kind mismatch that survives _normalize.
    for c in s.columns:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok and {sk, ok} <= set("iuf"):
            problems.append(
                f"representation mismatch in column {c!r}: spark dtype="
                f"{s[c].dtype} vs oracle dtype={o[c].dtype} (values may "
                "still be equal; the driver hashes dtype-sensitively)"
            )
    if problems:
        return problems
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc):
            import numpy as np

            bad = ~(
                np.isclose(sc.to_numpy(), oc.to_numpy(), rtol=0, atol=1e-9, equal_nan=True)
            )
        else:
            bad = ~((sc == oc) | (sc.isna() & oc.isna()))
        if bad.any():
            import numpy as np

            i = int(np.flatnonzero(np.asarray(bad))[0])
            problems.append(
                f"value mismatch in column {c!r}: first at sorted-row {i}: "
                f"spark={sc.iloc[i]!r} oracle={oc.iloc[i]!r} ({int(bad.sum())} rows differ)"
            )
    return problems


def run_query_vs_oracle(spark, sf_dir: str, name: str) -> list[str]:
    from lakeflush_spark.plans import QUERIES

    q = QUERIES[name]
    spark_pdf = q.builder(spark, sf_dir).toPandas()
    if q.oracle is None:
        return [] if len(spark_pdf) >= 0 else ["unreachable"]
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
