#!/usr/bin/env python
"""Trickle-batch crossover measurement for the boilerplate fp store's
``fp_prefix_partitions`` knob (r9 — the knob was wired end-to-end this
round; this script is its measured evidence, the ``cell_partitions``
trickle-vs-preloaded-store methodology applied to the fp store).

Method: preload a corpus-age fp store DIRECTLY (``n_hist_rows``
synthetic 32-hex fingerprints spread over ``n_batches`` committed
(run, batch) partitions — md5 output is uniform, so every ``_fp=xx``
prefix dir is populated), once flat and once prefix-partitioned via
the writer the stream itself uses (``fp_store_frame``). Then stream
ONE trickle batch (a few docs) through ``boilerplate_stream`` against
each store and time the batch. The trickle batch anchors a few dozen
window fingerprints, i.e. touches a few dozen of 256 prefixes — the
prefix layout should read ~that share of the store's files while the
flat layout scans all of them; the store APPEND side of the trade
(more, smaller partition dirs) is included in the same timing.

Usage: python scripts/fp_steady.py [n_hist_rows] [n_batches]
Prints one JSON line per layout plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HIST = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> int:
    import pyspark.sql.functions as F

    from lakeflush_spark import get_spark
    from lakeflush_spark.streaming.substring import (
        StreamBoilerplateConfig,
        boilerplate_stream,
        fp_store_frame,
    )

    spark = get_spark("lakeflush-fp-steady")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    work = tempfile.mkdtemp(prefix="lakeflush_fp_steady_")
    results = {}
    try:
        # synthetic committed history: md5(id) fingerprints are uniform
        # over the 256 prefixes, one count row each, spread over
        # N_BATCHES committed (run, batch) partitions under a run tag
        # that can never collide with the trickle stream's own
        hist = (
            spark.range(N_HIST)
            .select(
                F.md5(F.col("id").cast("string")).alias("fp"),
                F.lit(1).cast("long").alias("n"),
                (F.col("id") % N_BATCHES).cast("int").alias("batch"),
            )
            .withColumn("run", F.lit("preload"))
        )
        trickle_docs = [
            (i, " ".join(f"doc{i}tok{j}" for j in range(220)))
            for i in range(3)
        ]
        for layout, prefixed in (("flat", False), ("prefix", True)):
            store = os.path.join(work, f"fps_{layout}")
            rows, extra = fp_store_frame(hist, prefixed)
            # one file per partition dir in BOTH layouts, so the
            # comparison measures scan pruning, not accidental
            # small-file multiplication in the preload
            rows = rows.repartition("run", "batch", *[F.col(c) for c in extra])
            (
                rows.write.mode("overwrite")
                .partitionBy("run", "batch", *extra)
                .parquet(store)
            )
            src = os.path.join(work, f"src_{layout}")
            os.makedirs(src)
            stage = os.path.join(work, f"stage_{layout}")
            spark.createDataFrame(
                trickle_docs, "doc_id long, text string"
            ).coalesce(1).write.parquet(stage)
            import glob as _glob

            shutil.copy(
                _glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                os.path.join(src, "b0.parquet"),
            )
            cfg = StreamBoilerplateConfig(
                source_dir=src,
                dest_dir=os.path.join(work, f"dest_{layout}"),
                fp_dir=store,
                checkpoint_dir=os.path.join(work, f"ck_{layout}"),
                window=50,
                stride=8,
                min_docs=2,
                fp_prefix_partitions=prefixed,
            )
            t0 = time.time()
            done = boilerplate_stream(spark, cfg).awaitTermination(600)
            dt = time.time() - t0
            if not done:
                raise RuntimeError(f"{layout} trickle batch timed out")
            n_out = spark.read.parquet(cfg.dest_dir).count()
            results[layout] = round(dt, 2)

            # phase split: the HISTORY-READ term in isolation (the
            # knob's target — a whole trickle batch is dominated by
            # the ~4-5 s stream bootstrap fixed cost at this scale),
            # replayed through the stream's own helper against the
            # preloaded store; three repeats, first is cold
            from lakeflush_spark.operators.substring_dedup import (
                anchored_span_fps,
            )
            from lakeflush_spark.streaming.substring import (
                pruned_fp_history,
            )

            batch_counts = (
                spark.createDataFrame(
                    trickle_docs, "doc_id long, text string"
                )
                .select(
                    F.col("doc_id").alias("_id"),
                    F.explode(
                        anchored_span_fps("text", cfg.window, cfg.stride)
                    ).alias("fp"),
                )
                .groupBy("fp")
                .agg(F.countDistinct("_id").alias("n"))
                .persist()
            )
            batch_counts.count()
            reads = []
            for _ in range(3):
                t0 = time.time()
                hist_df = spark.read.option("basePath", store).parquet(store)
                pruned_fp_history(
                    hist_df, batch_counts,
                    fp_dir=store, fp_prefix_partitions=prefixed,
                ).count()
                reads.append(round(time.time() - t0, 2))
            batch_counts.unpersist()
            results[f"{layout}_read"] = reads[-1]
            print(json.dumps({
                "layout": layout,
                "trickle_batch_sec": round(dt, 2),
                "hist_read_sec": reads,
                "hist_rows": N_HIST,
                "hist_batches": N_BATCHES,
                "docs_out": n_out,
            }))
        print(json.dumps({
            "metric": "fp_prefix_trickle_speedup",
            "value": round(results["flat"] / results["prefix"], 2),
            "flat_sec": results["flat"],
            "prefix_sec": results["prefix"],
            "read_speedup": round(
                results["flat_read"] / results["prefix_read"], 2
            ),
            "flat_read_sec": results["flat_read"],
            "prefix_read_sec": results["prefix_read"],
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
