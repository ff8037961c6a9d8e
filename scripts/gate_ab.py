#!/usr/bin/env python
"""Isolate the r10 streaming regression's mechanism: per-ROW eval cost
vs per-BATCH plan/build cost of the fused metrics gate.

Variants (all semantically the n_tokens/stop_ratio/lang_pred
annotation + min_tokens filter — the bench stream's exact gate):

  fused    quality_gate_inline (r10): transform(array(struct))+inline
  staged1  quality_gate_stages stage-1 generator (r11; same fields)
  legacy   pre-fusion direct expressions: token_count / stopword_ratio
           / lang_id as three separate columns

For each: driver BUILD seconds (Column tree assembly + one analysis
via .schema on a 0-row frame), then execution seconds on (a) the full
sf0.1 documents table, (b) 16 consecutive small-batch runs (~1/16 of
the table) simulating micro-batch replanning (fresh Column tree per
run, like foreachBatch does).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import pyspark.sql.functions as F

    from lakeflush_spark import get_spark
    from lakeflush_spark.io import load_table

    spark = get_spark("gate-ab")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.count()
    small = docs.limit(1500).localCheckpoint()
    small.count()

    from lakeflush_spark.functions.text import lang_id, stopword_ratio, token_count
    from lakeflush_spark.pipelines import quality_gate_inline, quality_gate_stages

    def annotate_fused(df):
        return df.select("*", F.inline(quality_gate_inline("text")))

    def annotate_staged(df):
        cols1, _, _ = quality_gate_stages("text")
        return df.select("*", *cols1)

    def annotate_legacy(df):
        return df.withColumns(
            {
                "n_tokens": token_count("text"),
                "stop_ratio": stopword_ratio("text"),
                "lang_pred": lang_id("text"),
            }
        )

    empty = docs.limit(0).localCheckpoint()
    out: dict = {}
    for name, fn in (
        ("fused", annotate_fused),
        ("staged1", annotate_staged),
        ("legacy", annotate_legacy),
    ):
        t0 = time.time()
        _ = fn(empty).where(F.col("n_tokens") >= 1).schema
        build = time.time() - t0

        t0 = time.time()
        n_full = (
            fn(docs)
            .where(F.col("n_tokens") >= 1)
            .agg(
                F.sum("n_tokens").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .first()
        )
        full = time.time() - t0

        t0 = time.time()
        tot = 0
        for _ in range(16):
            tot += (
                fn(small)
                .where(F.col("n_tokens") >= 1)
                .agg(F.sum("n_tokens").alias("s"))
                .first()["s"]
            )
        batches = time.time() - t0
        out[name] = {
            "build_s": round(build, 3),
            "full_scan_s": round(full, 2),
            "check": int(n_full["s"] % 100000),
            "batch16_s": round(batches, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print("GATE_AB " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
