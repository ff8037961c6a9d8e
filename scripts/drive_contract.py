#!/usr/bin/env python
"""Drive the driver contract end-to-end, exactly as the verify driver does.

Fresh SparkSession (a PLAIN one, like the driver builds — not our tuned
factory), import ``__spark_entry__``, smoke ``entry()``, then run every
``queries()`` entry at sf0.01 side-by-side with its ``oracle_sql()`` in
DuckDB and compare row count + column names + order-insensitive values.

Usage: python scripts/drive_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    from pyspark.sql import SparkSession

    # Deliberately a plain session: the driver does NOT use our factory.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("drive-contract")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    t0 = time.time()
    edf = entrymod.entry(spark)
    rows = edf.collect()
    print(f"entry(): {len(rows)} rows, schema={edf.schema.simpleString()} "
          f"({time.time() - t0:.1f}s)")
    assert len(rows) >= 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    print(f"queries: {len(qs)}, oracled: {len(oracles)}")

    from lakeflush_spark.testing import (
        compare_frames,
        duckdb_connection,
        oracle_type_problems,
    )

    failures = []
    con = duckdb_connection(SF_DIR)
    # r14 (VERDICT r13 #2): bind every oracle first and reject any output
    # column outside the driver-safe type set (the q41 HUGEINT class).
    for name in sorted(oracles):
        bad = oracle_type_problems(con, oracles[name])
        if bad:
            failures.append(name)
            print(f"  FAIL {name}: oracle output type(s) outside driver-safe set: "
                  + ", ".join(bad))
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  FAIL {name}: spark raised {exc}")
            continue
        if name not in oracles:
            print(f"  rows-only {name}: {len(spark_pdf)} rows ({time.time() - t0:.1f}s)")
            continue
        oracle_pdf = con.execute(oracles[name]).fetchdf()
        problems = compare_frames(spark_pdf, oracle_pdf)
        status = "OK  " if not problems else "FAIL"
        if problems:
            failures.append(name)
        print(f"  {status} {name}: {len(spark_pdf)} rows ({time.time() - t0:.1f}s)"
              + ("; " + "; ".join(problems) if problems else ""))
    con.close()

    failed = sorted(set(failures))
    print(f"\n{'PASS' if not failed else 'FAIL'}: "
          f"{len(qs) - len(failed)}/{len(qs)} queries match at {SF_DIR}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
