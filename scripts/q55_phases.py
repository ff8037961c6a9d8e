#!/usr/bin/env python
"""Phase decomposition of the q55 builder (r14 optimization evidence).

Times each eager step of one q55 builder call (after the session index
memo is built and one warm pass) so the optimization targets the real
cost, not a guess: the two ivf_topk centroid persist+counts, each
materialize=True ivf_search, the pq/ivstream searches, and the final
noop materialization of the unioned frame.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from lakeflush_spark import get_spark

    spark = get_spark("q55-phases")
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    from lakeflush_spark.operators.pq import ivfpq_search
    from lakeflush_spark.operators.similarity import ivf_search, ivf_topk
    from lakeflush_spark.plans import QUERIES
    from lakeflush_spark.plans.similarity_queries import (
        _IVF_CELLS,
        _IVF_COARSE,
        _IVF_COARSE_PROBE,
        _IVF_NPROBE,
        TOP_K,
        _q55_index,
    )

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    corpus, queries, idx, idx8, idx_pq, idx_stream = _q55_index(spark, SF_DIR)
    print(f"memo build (first call only): {time.time()-t0:.2f}s")
    # one full warm pass
    t0 = time.time()
    mat(QUERIES["q55_ann_ivf"].builder(spark, SF_DIR))
    print(f"warm full pass: {time.time()-t0:.2f}s")

    # phase-by-phase of one more pass
    t0 = time.time()
    flat = ivf_topk(corpus, queries, TOP_K, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE)
    t1 = time.time()
    print(f"build flat (lazy + cents count): {t1-t0:.2f}s")
    served_raw = ivf_search(spark, idx, queries, TOP_K, nprobe=_IVF_NPROBE, materialize=True)
    t2 = time.time()
    print(f"served search (eager): {t2-t1:.2f}s")
    shuffled = ivf_search(spark, idx, queries, TOP_K, nprobe=_IVF_NPROBE,
                          broadcast_queries=False, materialize=True)
    t3 = time.time()
    print(f"shuffled search (eager): {t3-t2:.2f}s")
    int8_raw = ivf_search(spark, idx8, queries, TOP_K, nprobe=_IVF_NPROBE, materialize=True)
    t4 = time.time()
    print(f"int8 search (eager): {t4-t3:.2f}s")
    pq_raw = ivfpq_search(spark, idx_pq, queries, TOP_K, nprobe=_IVF_NPROBE,
                          rerank_index_dir=idx, rerank_factor=8, materialize=True)
    t5 = time.time()
    print(f"pq search (eager): {t5-t4:.2f}s")
    ivstream = ivf_search(spark, idx_stream, queries, TOP_K, nprobe=_IVF_NPROBE,
                          materialize=True)
    t6 = time.time()
    print(f"ivfstream search (eager): {t6-t5:.2f}s")
    two = ivf_topk(corpus, queries, TOP_K, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE,
                   coarse_cells=_IVF_COARSE, coarse_probe=_IVF_COARSE_PROBE)
    t7 = time.time()
    print(f"build twolevel (lazy + cents count): {t7-t6:.2f}s")
    mat(flat.unionByName(two).orderBy("query_id", "rank"))
    t8 = time.time()
    print(f"materialize flat+two union: {t8-t7:.2f}s")
    print(f"phase total: {t8-t0:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
