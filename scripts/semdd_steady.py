#!/usr/bin/env python
"""Steady-state semdedup_stream measurement (round-6 VERDICT item 3).

The per-round bench feeds ONE micro-batch (sf0.1 = 2k vectors) to an
EMPTY store, so `semdd_stream_vecs_s` is fixed-cost-dominated
(quantizer training + store bootstrap + stream start) and useless as
a trend line. This script measures the number that matters at scale:
warm multi-batch throughput with a populated store.

Method: replicate the sf embeddings 10x (id-offset copies), write as
``n_batches`` one-file parquet batches, stream them through ONE
semdedup_stream run with maxFilesPerTrigger=1, and read per-batch
wall times from the StreamingQuery progress feed. Batch 0 pays the
training/bootstrap cost; later batches are the steady state. A second
pass then times the three per-batch phases in isolation (history
read+prune count, verify join, survivor overwrite) against the final
store, using the same operators the stream composes.

Usage: python scripts/semdd_steady.py [replicas] [n_batches] [n_cells] [sf_dir]
Prints one JSON line per measurement. r6 findings recorded in
bench.py's notes: warm steady state is verify-join-bound (NOT
fixed-cost-bound), and n_cells is the working lever (16 -> 64 cells:
verify 5.6 s -> 2.1 s, warm 342 -> 655 vecs/s).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
N_CELLS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
SF_DIR = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"


def main() -> int:
    import pyspark.sql.functions as F

    from lakeflush_spark import get_spark
    from lakeflush_spark.io import load_table
    from lakeflush_spark.streaming.semdedup import (
        StreamSemDedupConfig,
        semdedup_stream,
    )

    spark = get_spark("lakeflush-semdd-steady")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    copies = spark.range(REPLICAS).withColumnRenamed("id", "_c")
    big = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("_c") * 10_000_000).alias("vec_id"), "embedding"
    )
    nvec = big.count()
    work = tempfile.mkdtemp(prefix="lakeflush_semdd_steady_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        # one file per batch, dropped in order (mod-split keeps batch
        # sizes equal and duplicate pairs spread across batches)
        for b in range(N_BATCHES):
            stage = os.path.join(work, f"stage{b}")
            big.where(F.col("vec_id") % N_BATCHES == b).coalesce(1).write.parquet(stage)
            part = [f for f in os.listdir(stage) if f.startswith("part-")][0]
            shutil.copy(os.path.join(stage, part), os.path.join(src, f"b{b}.parquet"))
        cfg = StreamSemDedupConfig(
            source_dir=src,
            dest_dir=os.path.join(work, "dest"),
            vec_dir=os.path.join(work, "vecs"),
            cent_dir=os.path.join(work, "cents"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            threshold=0.95,
            n_cells=N_CELLS,
            max_files_per_trigger=1,
        )
        t0 = time.time()
        q = semdedup_stream(spark, cfg)
        q.awaitTermination()
        total = time.time() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
        # numInputRows is inflated under foreachBatch (each action on
        # batch_df re-reads the source); batch size is nvec/N_BATCHES
        # by construction
        rows_per_batch = nvec // N_BATCHES
        per_batch = [
            {
                "batch": p["batchId"],
                "rows": rows_per_batch,
                "sec": round(p["durationMs"]["triggerExecution"] / 1000, 2),
            }
            for p in prog
            if p["numInputRows"] > 0
        ]
        warm = [b for b in per_batch if b["batch"] > 0]
        warm_rows = sum(b["rows"] for b in warm)
        warm_sec = sum(b["sec"] for b in warm)
        print(json.dumps({
            "stage": "stream", "vecs": nvec, "n_cells": N_CELLS, "batches": per_batch,
            "total_sec": round(total, 2),
            "overall_vecs_s": round(nvec / total, 1),
            "warm_vecs_s": round(warm_rows / warm_sec, 1) if warm_sec else None,
        }))

        # phase split against the FINAL store (the most history any
        # batch saw), replaying one batch through the stream's own ops
        from lakeflush_spark.operators.similarity import (
            _nearest_cells,
            _pack_cells,
            prepare_vectors,
        )
        from lakeflush_spark.functions.vectors import dot_product
        from lakeflush_spark.streaming.semdedup import load_or_init_centroids

        batch_df = spark.read.parquet(os.path.join(src, f"b{N_BATCHES - 1}.parquet"))
        vecs = prepare_vectors(batch_df, id_col="vec_id", vec_col="embedding")
        t0 = time.time()
        cents = load_or_init_centroids(spark, cfg.cent_dir, cfg.n_cells, vecs)
        t_cent = time.time() - t0
        indexed = _nearest_cells(vecs, _pack_cells(cents), 1).persist()
        indexed.count()
        t0 = time.time()
        hist = spark.read.parquet(cfg.vec_dir).select("vid", "v", "nrm", "cell_id")
        touched = indexed.select("cell_id").distinct()
        hist_pruned = hist.join(F.broadcast(touched), "cell_id", "semi").persist()
        n_hist = hist_pruned.count()
        t_read = time.time() - t0
        t0 = time.time()
        n_tag = indexed.select("vid", "v", "nrm", "cell_id").withColumn(
            "hist", F.lit(False)
        )
        others = n_tag.unionByName(hist_pruned.withColumn("hist", F.lit(True)))
        n, o = F.broadcast(n_tag).alias("n"), others.alias("o")
        dropped = (
            n.join(
                o,
                (F.col("n.cell_id") == F.col("o.cell_id"))
                & (F.col("o.hist") | (F.col("o.vid") < F.col("n.vid"))),
            )
            .where(
                F.round(
                    dot_product(F.col("n.v"), F.col("o.v"))
                    / (F.col("n.nrm") * F.col("o.nrm")),
                    4,
                )
                >= cfg.threshold
            )
            .select(F.col("n.vid").alias("vid"))
            .distinct()
            .persist()
        )
        n_drop = dropped.count()
        t_verify = time.time() - t0
        t0 = time.time()
        (
            indexed.join(F.broadcast(dropped), "vid", "left_anti")
            .withColumn("run", F.lit("probe"))
            .withColumn("batch", F.lit(999))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("run", "batch")
            .parquet(cfg.vec_dir)
        )
        t_write = time.time() - t0
        print(json.dumps({
            "stage": "phase_split", "batch_rows": batch_df.count(),
            "hist_rows_after_prune": n_hist, "dropped": n_drop,
            "centroid_load_sec": round(t_cent, 2),
            "hist_read_prune_sec": round(t_read, 2),
            "verify_join_sec": round(t_verify, 2),
            "store_write_sec": round(t_write, 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
