#!/usr/bin/env python
"""Isolated warm per-query timer for the optimization loop (r14).

Times just the named headline entries with the bench's own methodology
(tuned session, noop sink, N warmup + M timed interleaved passes) so a
single query's before/after can be measured in ~1 min instead of a
full bench run. Job descriptions are set per query (guide §1.5).

Usage: python scripts/qtime.py q55_ann_ivf [q60_stratified_sample ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       QTIME_WARMUP (default 1), QTIME_TRIALS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP = int(os.environ.get("QTIME_WARMUP", "1"))
TRIALS = int(os.environ.get("QTIME_TRIALS", "3"))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: qtime.py <query> [query ...]")
        return 2
    os.environ.setdefault("LAKEFLUSH_Q41_ORACLE", "0")
    # same session posture as bench.py (r15: heap pre-touch is gated
    # on the bench marker) so isolated A/B numbers stay comparable
    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    from lakeflush_spark import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")

    from lakeflush_spark.plans import QUERIES

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for _ in range(WARMUP):
        for name in names:
            mat(QUERIES[name].builder(spark, SF_DIR))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(TRIALS):
        for name in names:
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            mat(QUERIES[name].builder(spark, SF_DIR))
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    medians = {n: sorted(ts)[len(ts) // 2] for n, ts in samples.items()}
    print(json.dumps({"medians": medians, "samples": samples}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
