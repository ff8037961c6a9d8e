#!/usr/bin/env python
"""Stage-level decomposition of the q24 near-dup chain's time-vs-data
curve (VERDICT r10 #3): the 20x-vs-4x smoke has read ~7x time for 5x
data three rounds running while pair ROWS grow exactly 5x — find which
stage is super-linear in SECONDS.

Stages timed separately at each N (same replicated corpus as
scripts/scale_smoke.py — token-salted copies so cross-copy Jaccard is
0 and planted pairs scale linearly):

  sig_pass   with_minhash projection materialized (map-only minhash)
  band_join  lsh_candidate_pairs count (band explode + self-join +
             distinct) MINUS nothing — includes the sig pass, so the
             delta vs sig_pass isolates the join
  verify     minhash_near_dups count (adds candidate semi-join +
             shingle re-derivation + blocked exact Jaccard)
  cc         near_dup_clusters over the checkpointed pair table
             (min-label propagation + pointer jumping rounds)

Usage: python scripts/q24_stage_decomp.py [N ...] (default: 4 20)
Prints one JSON line per (N, stage).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NS = [int(a) for a in sys.argv[1:]] or [4, 20]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import pyspark.sql.functions as F

    from lakeflush_spark import get_spark
    from lakeflush_spark.io import load_table
    from lakeflush_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        near_dup_clusters,
        unpersist_pair_cache,
        with_minhash,
    )

    spark = get_spark("q24-stage-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )

    for N in NS:
        copies = spark.range(N).withColumnRenamed("id", "_copy")
        salted = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("_"), F.col("_copy").cast("string")),
            ),
        )
        big = (
            docs.crossJoin(F.broadcast(copies))
            .select(
                (F.col("doc_id") + F.col("_copy") * 10_000_000).alias("doc_id"),
                "source",
                F.when(F.col("_copy") == 0, F.col("text"))
                .otherwise(salted)
                .alias("text"),
            )
            .repartition(64)
            .localCheckpoint()
        )
        n_docs = big.count()

        def emit(stage: str, rows: int, sec: float, **kw) -> None:
            print(
                json.dumps(
                    {"N": N, "docs": n_docs, "stage": stage,
                     "rows": rows, "sec": round(sec, 2), **kw}
                ),
                flush=True,
            )

        # stage 1: the map-only signature pass alone (count() over the
        # projected band columns forces the minhash computation; the
        # aggregate itself is negligible)
        t0 = time.time()
        n = (
            with_minhash(big)
            .select(F.sum(F.col("_band0") % 7).alias("s"))
            .first()["s"]
        )
        emit("sig_pass", n_docs, time.time() - t0, check=int(n % 1000))

        # stage 2: band explode + self-join + distinct (includes sig)
        t0 = time.time()
        n_cand = lsh_candidate_pairs(with_minhash(big)).count()
        emit("band_join_cum", n_cand, time.time() - t0)

        # stage 3: full pair chain (adds semi-join + shingle re-derive
        # + exact-Jaccard verify). minhash_near_dups persists the pair
        # table; count() materializes everything.
        t0 = time.time()
        pairs = minhash_near_dups(big, threshold=0.5)
        n_pairs = pairs.count()
        emit("verify_cum", n_pairs, time.time() - t0)

        # stage 4: CC over the checkpointed pairs (isolated: input is
        # materialized, so this times ONLY the label-propagation loop)
        pairs_ck = pairs.localCheckpoint()
        unpersist_pair_cache()
        t0 = time.time()
        n_cc = near_dup_clusters(pairs_ck).count()
        emit("cc", n_cc, time.time() - t0)

        # stage 5: the contract entry's final global sort shape (q24
        # orders by id1, id2 for the oracle compare)
        t0 = time.time()
        n_sorted = len(pairs_ck.orderBy("id1", "id2").collect())
        emit("final_sort", n_sorted, time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
