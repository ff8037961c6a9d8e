#!/usr/bin/env python
"""Isolated warm timer for the serving rows (r15) — bm25 build/search,
ivf build, hybrid, pq encode/search — with the bench's exact shapes
(fresh temp index dirs per trial, same calls), so a serving-op A/B can
run in ~2 min instead of a full bench. Medians of N trials after one
warmup trial; per-phase wall seconds printed as one JSON line.

Usage: python scripts/serve_time.py [op ...]   (default: all)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SERVE_TRIALS (default 3)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("SERVE_TRIALS", "3"))

OPS = ("bm25_build", "bm25_search", "ivf_build", "hybrid", "pq_encode",
       "pq_search", "report", "lm", "semdedup")


def main() -> int:
    names = sys.argv[1:] or list(OPS)
    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    from lakeflush_spark import get_spark

    spark = get_spark("serve-time")
    spark.sparkContext.setLogLevel("ERROR")

    from lakeflush_spark.io import load_table
    from lakeflush_spark.operators.retrieval import (
        bm25_search,
        build_bm25_index,
        hybrid_search,
    )
    from lakeflush_spark.operators.similarity import (
        build_ivf_index,
        prepare_vectors,
    )
    from lakeflush_spark.plans.retrieval_queries import QUERIES as BM25_QUERIES

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    qvecs = {
        r.vec_id: list(r.embedding) for r in emb.where("vec_id < 4").collect()
    }
    hybrid_queries = [(qid, text, qvecs[qid]) for qid, text in BM25_QUERIES]

    samples: dict[str, list[float]] = {n: [] for n in names}
    work = tempfile.mkdtemp(prefix="lakeflush_servetime_")
    # persistent indexes for the search-side ops (built once, untimed)
    bm25_idx = os.path.join(work, "bm25_base")
    ivf_idx = os.path.join(work, "ivf_base")
    pq_idx = os.path.join(work, "pq_base")
    build_bm25_index(docs, bm25_idx)
    build_ivf_index(prepare_vectors(emb), ivf_idx, n_cells=16)
    from lakeflush_spark.operators.pq import ivfpq_search, pq_encode_index

    pq_encode_index(spark, ivf_idx, pq_idx, m=16, n_codes=64)
    try:
        for trial in range(TRIALS + 1):  # first = warmup
            t = {}
            if "bm25_build" in names:
                d = os.path.join(work, f"bm25_{trial}")
                t0 = time.time()
                build_bm25_index(docs, d)
                t["bm25_build"] = time.time() - t0
                shutil.rmtree(d, ignore_errors=True)
            if "bm25_search" in names:
                t0 = time.time()
                bm25_search(spark, bm25_idx, BM25_QUERIES, k=10).collect()
                t["bm25_search"] = time.time() - t0
            if "ivf_build" in names:
                d = os.path.join(work, f"ivf_{trial}")
                t0 = time.time()
                build_ivf_index(prepare_vectors(emb), d, n_cells=16)
                t["ivf_build"] = time.time() - t0
                shutil.rmtree(d, ignore_errors=True)
            if "hybrid" in names:
                t0 = time.time()
                hybrid_search(
                    spark, bm25_idx, ivf_idx, hybrid_queries, k=10
                ).collect()
                t["hybrid"] = time.time() - t0
            if "pq_encode" in names:
                d = os.path.join(work, f"pq_{trial}")
                t0 = time.time()
                pq_encode_index(spark, ivf_idx, d, m=16, n_codes=64)
                t["pq_encode"] = time.time() - t0
                shutil.rmtree(d, ignore_errors=True)
            if "pq_search" in names:
                pq_queries = prepare_vectors(emb).where("vid < 4")
                t0 = time.time()
                ivfpq_search(
                    spark, pq_idx, pq_queries, k=10, nprobe=8,
                    rerank_index_dir=ivf_idx, rerank_factor=8,
                    materialize=True,
                ).collect()
                t["pq_search"] = time.time() - t0
            if "report" in names:
                from lakeflush_spark.operators.report import corpus_report

                t0 = time.time()
                corpus_report(docs).collect()
                t["report"] = time.time() - t0
            if "lm" in names:
                from lakeflush_spark.operators.lm_filter import (
                    lm_logprob_scores,
                    train_bigram_lm,
                )

                t0 = time.time()
                lm = train_bigram_lm(docs, buckets=1 << 20).localCheckpoint()
                t["lm"] = time.time() - t0
                t0 = time.time()
                lm_logprob_scores(lm, docs, buckets=1 << 20).agg(
                    {"avg_logprob": "avg"}
                ).collect()
                t["lm_score"] = time.time() - t0
            if "semdedup" in names:
                from lakeflush_spark.operators.similarity import (
                    semantic_dedup_pairs,
                )

                t0 = time.time()
                semantic_dedup_pairs(
                    prepare_vectors(emb), threshold=0.4
                ).count()
                t["semdedup"] = time.time() - t0
            if trial > 0:
                for k, v in t.items():
                    samples.setdefault(k, []).append(round(v, 3))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    medians = {
        k: sorted(v)[len(v) // 2] for k, v in samples.items() if v
    }
    print(json.dumps({"medians": medians, "samples": samples}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
