#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for every headline query (r14).

Writes ``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt`` (round
default "r15") for each bench HEADLINE entry (tag = argv[1], default
"before") — the optimization round's evidence files: the judge checks
plan claims (Exchange counts, join strategies, PushedFilters,
Python-eval nodes) against these.

Usage: python scripts/capture_plans.py [tag] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])


def main() -> int:
    os.environ.setdefault("LAKEFLUSH_Q41_ORACLE", "0")
    from lakeflush_spark import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from lakeflush_spark.plans import PLAN_FRAMES, QUERIES

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans",
                           os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    names = [n for n in bench.HEADLINE if not ONLY or n in ONLY]
    for name in names:
        builder = PLAN_FRAMES.get(name, QUERIES[name].builder)
        try:
            df = builder(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building {name}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{TAG}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} bytes -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
