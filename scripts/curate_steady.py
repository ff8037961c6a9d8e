#!/usr/bin/env python
"""Steady-state measurement of the COMPOSED curation stream with the
semantic stage on (r7 — the semdd_steady.py method applied to
curate_stream).

The per-round bench's `curate_sem_docs_s` is a cold single-batch
number (stream start + quantizer training + five empty stores). This
script measures the trend line that matters: warm multi-batch
throughput with populated digest/signature/vector stores, plus the
per-batch stats rows' stage attribution (the stream's own audit
table tells us where documents went; wall time per batch comes from
the StreamingQuery progress feed).

Method: join the sf documents and embeddings tables on
doc_id = vec_id, replicate ``replicas``x with id offsets and
token-level copy salting (cross-copy lexical similarity zero, planted
near-dup pairs preserved — the scale_smoke recipe) and fresh
embeddings jitter per copy (deterministic md5-free: offset index
scales a fixed perturbation so copies are NOT embedding-near-dups of
each other), write ``n_batches`` one-file batches, stream them
through ONE curate_stream run with maxFilesPerTrigger=1, and report
per-batch wall seconds from the progress feed. Batch 0 pays
training/bootstrap; later batches are steady state.

Usage: python scripts/curate_steady.py [replicas] [n_batches] [sem_cells] [sf_dir]

``sem_cells=0`` runs the stream WITHOUT the semantic stage (quality +
exact dedup + LSH near-dup + stores only) — the r10 trigger-size
amortization curve uses this mode, because the per-batch FIXED
overhead (store reads/writes + stats append) is what trigger size
amortizes, while the semantic verify term grows with batch size and
is governed by cell occupancy instead (see the r7 notes).

Prints one JSON line per measurement; findings go in bench.py notes.
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
SEM_CELLS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
SF_DIR = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"


def main() -> int:
    import pyspark.sql.functions as F

    from lakeflush_spark import get_spark
    from lakeflush_spark.io import load_table
    from lakeflush_spark.streaming.curation import (
        CurationStreamConfig,
        curate_stream,
    )

    spark = get_spark("lakeflush-curate-steady")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    base = docs.join(emb, "doc_id")
    copies = spark.range(REPLICAS).withColumnRenamed("id", "_c")
    salted = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("_"), F.col("_c").cast("string")),
        ),
    )
    # per-copy embedding decorrelation: cyclically shift the array by
    # the copy index. Within a copy every pairwise cosine is preserved
    # (the copy's REAL neighbor structure), while across copies two
    # shifted random vectors land near cosine 0 — so the pair count
    # grows linearly in replicas, not quadratically. (A coordinate
    # nudge is NOT enough: on a 64-dim vector a one-coordinate +3
    # leaves cosine ≈ 0.97 — above threshold — and every copy pair
    # becomes a synthetic dup.)
    dims = F.size(F.col("embedding"))
    shift = F.pmod(F.col("_c"), dims)
    jittered = F.concat(
        F.slice(F.col("embedding"), shift + 1, dims - shift),
        F.slice(F.col("embedding"), F.lit(1), shift),
    )
    big = base.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("_c") * 10_000_000).alias("doc_id"),
        F.when(F.col("_c") == 0, F.col("text")).otherwise(salted).alias("text"),
        F.when(F.col("_c") == 0, F.col("embedding")).otherwise(jittered).alias(
            "embedding"
        ),
    )
    ndocs = big.count()
    work = tempfile.mkdtemp(prefix="lakeflush_curate_steady_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        for b in range(N_BATCHES):
            stage = os.path.join(work, f"stage{b}")
            big.where(F.col("doc_id") % N_BATCHES == b).coalesce(1).write.parquet(
                stage
            )
            part = [f for f in os.listdir(stage) if f.startswith("part-")][0]
            shutil.copy(
                os.path.join(stage, part), os.path.join(src, f"b{b}.parquet")
            )
        sem_kw = (
            dict(
                embedding_col="embedding",
                sem_vec_dir=os.path.join(work, "semvecs"),
                sem_cent_dir=os.path.join(work, "semcents"),
                sem_threshold=0.95,
                sem_n_cells=SEM_CELLS,
            )
            if SEM_CELLS > 0
            else {}
        )
        cfg = CurationStreamConfig(
            source_dir=src,
            dest_dir=os.path.join(work, "dest"),
            digest_dir=os.path.join(work, "digests"),
            sig_dir=os.path.join(work, "sigs"),
            stats_dir=os.path.join(work, "stats"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            min_tokens=1,
            max_files_per_trigger=1,
            **sem_kw,
        )
        t0 = time.time()
        q = curate_stream(spark, cfg)
        q.awaitTermination()
        total = time.time() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
        rows_per_batch = ndocs // N_BATCHES
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
        stats = [
            {
                k: (int(v) if v is not None else None)
                for k, v in r.asDict().items()
                if k not in ("run",)
            }
            for r in spark.read.parquet(cfg.stats_dir).orderBy("batch").collect()
        ]
        print(
            json.dumps(
                {
                    "stage": "curate_stream",
                    "docs": ndocs,
                    "sem_cells": SEM_CELLS,
                    "batches": per_batch,
                    "stats": stats,
                    "total_sec": round(total, 2),
                    "overall_docs_s": round(ndocs / total, 1),
                    "warm_docs_s": round(warm_rows / warm_sec, 1)
                    if warm_sec
                    else None,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
