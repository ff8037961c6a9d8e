#!/usr/bin/env python
"""Phase decomposition of the q60 builder (r14 optimization evidence).

Times each eager step of one q60 builder call after a full warm pass
(session memos built), so the optimization targets the real cost: the
three localCheckpoint jobs (d proxy / corpus_report / fused flags
panel), the driver-side label assembly, and the final noop
materialization of the 17-label union.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    os.environ.setdefault("LAKEFLUSH_Q41_ORACLE", "0")
    from lakeflush_spark import get_spark

    spark = get_spark("q60-phases")
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    from lakeflush_spark.io import load_table, spread_for_compute
    from lakeflush_spark.operators.report import corpus_report
    from lakeflush_spark.plans import QUERIES
    from lakeflush_spark.plans.text_queries import _q60_fl_gen, token_count

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # memo-building first pass + one warm pass
    t0 = time.time()
    mat(QUERIES["q60_stratified_sample"].builder(spark, SF_DIR))
    print(f"first pass (memo build): {time.time()-t0:.2f}s")
    t0 = time.time()
    mat(QUERIES["q60_stratified_sample"].builder(spark, SF_DIR))
    print(f"warm full pass: {time.time()-t0:.2f}s")

    # phase-by-phase of one more pass
    docs = spread_for_compute(load_table(spark, SF_DIR, "documents"), spark)
    t0 = time.time()
    d = docs.select(
        "doc_id", "lang", "source", token_count("text").alias("n_tokens")
    ).localCheckpoint()
    t1 = time.time()
    print(f"d proxy checkpoint (eager): {t1-t0:.2f}s")
    rep = corpus_report(docs, flag_profile=False).localCheckpoint()
    t2 = time.time()
    print(f"corpus_report checkpoint (eager): {t2-t1:.2f}s")
    flclf = docs.select(
        "source", "doc_id", F.inline(_q60_fl_gen())
    ).localCheckpoint()
    t3 = time.time()
    print(f"flags-panel checkpoint (eager): {t3-t2:.2f}s")
    # full builder call again: build-phase total minus the three
    # checkpoints above approximates the py4j assembly constant
    t4 = time.time()
    df = QUERIES["q60_stratified_sample"].builder(spark, SF_DIR)
    t5 = time.time()
    print(f"full builder call (3 ckpts + assembly): {t5-t4:.2f}s")
    mat(df)
    t6 = time.time()
    print(f"materialize union: {t6-t5:.2f}s")
    print(f"builder+materialize total: {t6-t4:.2f}s")
    for fr in (d, rep, flclf):
        fr.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
