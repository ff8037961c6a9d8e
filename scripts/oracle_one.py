#!/usr/bin/env python
"""Focused oracle check: run only the NAMED queries() entries against
their DuckDB oracles, with the driver's posture (plain local[8]
session). A fast slice of drive_contract.py for the optimization loop.

Usage: python scripts/oracle_one.py q55_ann_ivf [q41_wordcount_topk ...]
       [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        print("usage: oracle_one.py <query> [query ...] [--sf dir]")
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-one")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    from lakeflush_spark.testing import compare_frames, duckdb_connection

    con = duckdb_connection(sf_dir)
    failed = []
    for name in args:
        t0 = time.time()
        spark_pdf = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  rows-only {name}: {len(spark_pdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        oracle_pdf = con.execute(oracles[name]).fetchdf()
        problems = compare_frames(spark_pdf, oracle_pdf)
        if problems:
            failed.append(name)
        print(f"  {'FAIL' if problems else 'OK  '} {name}: "
              f"{len(spark_pdf)} rows ({time.time() - t0:.1f}s)"
              + ("; " + "; ".join(problems) if problems else ""))
    con.close()
    print("PASS" if not failed else f"FAIL: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
