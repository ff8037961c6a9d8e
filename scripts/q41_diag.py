#!/usr/bin/env python
"""One-command q41 divergence diagnosis (r13, VERDICT r12 #1).

Builds q41_wordcount_topk with the in-process DuckDB oracle replay
FORCED on (any scale), prints the sidecar path, per-label row counts /
md5 agreement, float-surface margins, and — when anything diverges —
the exact divergent rows from both engines.

Usage: python scripts/q41_diag.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    os.environ["LAKEFLUSH_Q41_ORACLE"] = "1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("q41-diag")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lakeflush_spark.plans import QUERIES
    from lakeflush_spark.plans.q41_debug import DEBUG_DIR

    before = set(os.listdir(DEBUG_DIR)) if os.path.isdir(DEBUG_DIR) else set()
    n = QUERIES["q41_wordcount_topk"].builder(spark, SF_DIR).count()
    new = sorted(set(os.listdir(DEBUG_DIR)) - before)
    if not new:
        print(f"rows={n} but NO sidecar written under {DEBUG_DIR}")
        return 2
    path = os.path.join(DEBUG_DIR, new[-1])
    with open(path) as fh:
        doc = json.load(fh)
    print(f"sidecar: {path}")
    print(f"rows: spark={doc['spark_total_rows']} "
          f"oracle={doc.get('oracle_total_rows')}")
    print(f"session: {doc['session']}")
    for lab, d in sorted(doc["spark_labels"].items()):
        o = (doc.get("oracle_labels") or {}).get(lab, {})
        ok = "OK " if o.get("md5") == d["md5"] else "DIVERGED"
        print(f"  {ok} {lab}: rows={d['rows']} md5={d['md5'][:12]} "
              f"oracle_md5={str(o.get('md5'))[:12]}")
    if doc.get("float_margins"):
        print(f"margins: {doc['float_margins']}")
    div = doc.get("diverged_labels") or {}
    for lab, rows in div.items():
        print(f"\nDIVERGED {lab}:")
        for side in ("spark_only", "oracle_only"):
            for r in rows[side]:
                print(f"  {side}: {r}")
    if doc.get("oracle_error"):
        print(f"oracle error: {doc['oracle_error']}")
        return 2
    return 1 if div else 0


if __name__ == "__main__":
    raise SystemExit(main())
