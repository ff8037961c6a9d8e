#!/usr/bin/env python
"""Steady-state phash_dedup_stream measurement (r11).

The per-round bench feeds ONE micro-batch of 2k synthetic PNGs to an
EMPTY hash store, so `phash_stream_imgs_s` mixes decode cost with
stream bootstrap. This script measures warm multi-batch throughput
with a populated store, plus a per-phase split of a single batch
against the final store — the number that matters for continuous
image ingest.

Method: generate ``n_imgs`` grouped-blob PNGs (md5-spread centers,
radius/polarity varied — the bench generator), write as ``n_batches``
one-file parquet batches, stream through ONE phash_dedup_stream run
with maxFilesPerTrigger=1, read per-batch wall times from the
progress feed. Batch 0 pays bootstrap; later batches are the steady
state, each scanning a growing hash store.

Usage: python scripts/phash_steady.py [n_imgs] [n_batches]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMGS = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def _png_batches(batches):
    import hashlib

    import numpy as np
    import pandas as pd

    from lakeflush_spark.operators.png_codec import encode_png

    yy, xx = np.mgrid[0:32, 0:32]
    for pdf in batches:
        rows = []
        for mid in pdf["media_id"]:
            g = int(mid) // 4
            hy = int(hashlib.md5(f"y:{g}".encode()).hexdigest()[:4], 16)
            hx = int(hashlib.md5(f"x:{g}".encode()).hexdigest()[:4], 16)
            hf = int(hashlib.md5(f"f:{g}".encode()).hexdigest()[:4], 16)
            cy, cx = 2 + hy % 28, 2 + hx % 28
            f = 1 + hf % 3
            inv = hf % 2
            rng = np.random.default_rng(int(mid))
            base = np.clip(230 - f * ((yy - cy) ** 2 + (xx - cx) ** 2), 0, 230)
            if inv:
                base = 230 - base
            img = np.clip(base + rng.integers(-5, 6, size=(32, 32)), 0, 255).astype(
                "uint8"
            )
            rows.append((int(mid), bytearray(encode_png(img))))
        yield pd.DataFrame(rows, columns=["media_id", "payload"])


def main() -> int:
    import pyspark.sql.functions as F

    from lakeflush_spark import get_spark
    from lakeflush_spark.streaming.phash import (
        StreamPhashConfig,
        phash_dedup_stream,
    )

    spark = get_spark("lakeflush-phash-steady")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="lakeflush_phash_steady_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        all_imgs = (
            spark.range(N_IMGS)
            .withColumnRenamed("id", "media_id")
            .repartition(16)
            .mapInPandas(_png_batches, "media_id long, payload binary")
        )
        # mod-split spreads each near-dup group of 4 ACROSS batches, so
        # warm batches genuinely hit history
        for b in range(N_BATCHES):
            stage = os.path.join(work, f"stage{b}")
            all_imgs.where(F.col("media_id") % N_BATCHES == b).coalesce(
                1
            ).write.parquet(stage)
            part = [f for f in os.listdir(stage) if f.startswith("part-")][0]
            shutil.copy(os.path.join(stage, part), os.path.join(src, f"b{b}.parquet"))
        cfg = StreamPhashConfig(
            source_dir=src,
            dest_dir=os.path.join(work, "dest"),
            hash_dir=os.path.join(work, "hashes"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=1,
        )
        t0 = time.time()
        q = phash_dedup_stream(spark, cfg)
        q.awaitTermination()
        total = time.time() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
        rows_per_batch = N_IMGS // N_BATCHES
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
        kept = spark.read.parquet(cfg.dest_dir).count()
        print(json.dumps({
            "stage": "stream", "imgs": N_IMGS, "batches": per_batch,
            "total_sec": round(total, 2),
            "overall_imgs_s": round(N_IMGS / total, 1),
            "warm_imgs_s": round(warm_rows / warm_sec, 1) if warm_sec else None,
            "kept": kept,
        }))

        # phase split: replay the LAST batch through the stream's own
        # ops against the final store
        from lakeflush_spark.operators.phash import phash_images, phash_near_dups
        from lakeflush_spark.streaming.phash import against_history_phash

        batch_df = spark.read.parquet(os.path.join(src, f"b{N_BATCHES - 1}.parquet"))
        t0 = time.time()
        hashes = phash_images(batch_df).localCheckpoint()
        n_h = hashes.count()
        t_hash = time.time() - t0
        t0 = time.time()
        n_within = phash_near_dups(hashes).count()
        t_within = time.time() - t0
        t0 = time.time()
        hist = spark.read.parquet(cfg.hash_dir).select("media_id", "phash")
        n_hist_hits = against_history_phash(hashes, hist, "media_id").count()
        t_hist = time.time() - t0
        print(json.dumps({
            "stage": "phase_split", "batch_rows": n_h,
            "decode_hash_sec": round(t_hash, 2),
            "within_pairs_sec": round(t_within, 2), "within_pairs": n_within,
            "history_probe_sec": round(t_hist, 2), "history_hits": n_hist_hits,
            "store_rows": hist.count(),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
