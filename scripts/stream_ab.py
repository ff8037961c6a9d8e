"""A/B probe for the r10 streaming/report throughput drop (VERDICT r10 #1).

Runs the bench's report + streaming-semdedup + warm-curation blocks
N times in THIS checkout and prints per-block timings — run it once on
HEAD and once on the pre-fusion commit (236bbdc~1) in a scratch
worktree, interleaved, to separate code effect from box state.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import shutil
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "2"))
#: comma list of blocks to run: report,semdd,warm (default all)
BLOCKS = set(
    os.environ.get("AB_BLOCKS", "report,semdd,warm").split(",")
)


def main():
    from lakeflush_spark import get_spark
    from lakeflush_spark.io import load_table

    spark = get_spark("stream-ab")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "lineitem").agg({"l_orderkey": "max"}).collect()

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    out = {}

    from lakeflush_spark.operators.report import corpus_report

    for r in range(REPS if "report" in BLOCKS else 0):
        t0 = time.time()
        corpus_report(docs).collect()
        out.setdefault("report_sec", []).append(round(time.time() - t0, 2))

    from lakeflush_spark.streaming.semdedup import (
        StreamSemDedupConfig,
        semdedup_stream,
    )

    for r in range(REPS if "semdd" in BLOCKS else 0):
        work = tempfile.mkdtemp(prefix="ab_semdd_")
        try:
            src = os.path.join(work, "src")
            emb.select("vec_id", "embedding").repartition(4).write.parquet(src)
            cfg = StreamSemDedupConfig(
                source_dir=src,
                dest_dir=os.path.join(work, "dest"),
                vec_dir=os.path.join(work, "vecs"),
                cent_dir=os.path.join(work, "cents"),
                checkpoint_dir=os.path.join(work, "ckpt"),
                threshold=0.95,
            )
            t0 = time.time()
            semdedup_stream(spark, cfg).awaitTermination()
            out.setdefault("semdd_stream_sec", []).append(
                round(time.time() - t0, 2)
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)

    from lakeflush_spark.streaming.curation import (
        CurationStreamConfig,
        curate_stream,
    )

    joined = docs.join(
        emb.withColumnRenamed("vec_id", "doc_id"), "doc_id"
    ).select("doc_id", "text", "embedding")
    for r in range(REPS if "warm" in BLOCKS else 0):
        work = tempfile.mkdtemp(prefix="ab_curatew_")
        try:
            src = os.path.join(work, "src")
            joined.repartition(8).write.parquet(src)
            wcfg = CurationStreamConfig(
                source_dir=src,
                dest_dir=os.path.join(work, "dest"),
                digest_dir=os.path.join(work, "digests"),
                sig_dir=os.path.join(work, "sigs"),
                stats_dir=os.path.join(work, "stats"),
                checkpoint_dir=os.path.join(work, "ckpt"),
                min_tokens=1,
                embedding_col="embedding",
                sem_vec_dir=os.path.join(work, "semvecs"),
                sem_cent_dir=os.path.join(work, "semcents"),
                sem_threshold=0.95,
                max_files_per_trigger=2,
            )
            q = curate_stream(spark, wcfg)
            q.awaitTermination()
            prog = [
                p if isinstance(p, dict) else json.loads(p.json)
                for p in q.recentProgress
            ]
            warm = [
                p
                for p in prog
                if int(p.get("batchId", -1)) >= 1
                and int(p.get("numInputRows", 0)) > 0
            ]
            rows = sum(int(p["numInputRows"]) for p in warm)
            secs = sum(
                float(
                    p.get("batchDuration")
                    or p.get("durationMs", {}).get("triggerExecution", 0)
                )
                for p in warm
            ) / 1000.0
            out.setdefault("curate_warm_docs_s", []).append(
                round(rows / secs, 1) if secs else None
            )
            out.setdefault("curate_warm_batch_secs", []).append(
                [
                    round(
                        float(
                            p.get("durationMs", {}).get("triggerExecution", 0)
                        )
                        / 1000.0,
                        2,
                    )
                    for p in warm
                ]
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print("AB_RESULT " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
