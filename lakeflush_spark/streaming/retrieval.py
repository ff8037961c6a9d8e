"""BM25 indexing on arrival — a searchable inverted index maintained
per micro-batch (r13).

The batch surface (``operators/retrieval.py``) builds and appends a
term-bucket-partitioned index; this module keeps one CURRENT as
documents arrive, the way ``streaming/dedup.py`` keeps digest stores:
each micro-batch writes its postings / df-increment / stats-increment
rows under ``(run, batch)`` partitions with dynamic partition
overwrite, so a crashed batch's foreachBatch REPLAY replaces its own
prior attempt instead of double-appending (batch content is
deterministic under the AvailableNow file source).

Layout = ``build_bm25_index``'s plus the replay columns:

- ``postings/`` — ``(term, {id_col}, tf, dl)`` partitioned by
  ``(_tb, run, batch)``; ``_tb`` stays the LEADING partition, so
  :func:`~lakeflush_spark.operators.retrieval.bm25_search`'s
  query-bucket directory pruning is unchanged.
- ``terms/`` — per-batch ``(term, df)`` increments, same partitioning.
- ``stats/`` — per-batch one-row ``(n_docs, total_len)`` increments
  under ``(run, batch)``.

``bm25_search`` aggregates terms/stats at read time (the r13 append
semantics), so an index maintained here serves scores IDENTICAL to a
one-shot ``build_bm25_index`` over the same documents — unit-tested in
``tests/test_retrieval.py``. Searches against an index mid-batch-write
may see a partially landed increment (postings before df rows); serve
from a quiesced index, or accept that one-batch staleness window —
the same posture every ``compact_*`` store documents.

Caller contract: arriving ids must be new to the index (exact dedup —
``streaming/dedup.py`` — is the upstream stage; this module indexes,
it does not deduplicate).

At 100 TB: per batch this is the batch build's own shape — one
explode + a map-side-combinable (term, doc) groupBy — over the
micro-batch only; history is never read, let alone shuffled. Compact
offline with ``operators.retrieval.compact_bm25_index`` (the
``(run, batch)`` columns are pruned by its read) when increment-row or
file counts grow.

Reference parity: none — /root/reference has no retrieval surface
(SURVEY.md §2.B); this extends the engine's declared serving story.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.functions.text import tokens
from lakeflush_spark.operators.retrieval import (
    DEFAULT_TERM_BUCKETS,
    _term_bucket_col,
)
from lakeflush_spark.streaming.dedup import _cfg_stream, _run_tag


@dataclass
class StreamIndexConfig:
    #: streaming source directory of document files
    source_dir: str
    #: the maintained index directory (postings/ terms/ stats/)
    index_dir: str
    checkpoint_dir: str
    id_col: str = "doc_id"
    text_col: str = "text"
    #: must be constant over the index's lifetime (on-disk layout)
    n_buckets: int = DEFAULT_TERM_BUCKETS
    source_format: str = "parquet"
    source_options: dict | None = None
    max_files_per_trigger: int | None = None


def bm25_index_stream(
    spark: SparkSession, cfg: StreamIndexConfig, schema=None
):
    """Start the index-on-arrival stream (``Trigger.AvailableNow``).
    Returns the StreamingQuery; ``awaitTermination()`` it, then search
    the index with ``operators.retrieval.bm25_search``."""
    stream = _cfg_stream(spark, cfg, schema)
    run = _run_tag(cfg.checkpoint_dir)
    base = cfg.index_dir.rstrip("/")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        d = batch_df.select(
            F.col(cfg.id_col), tokens(cfg.text_col).alias("_toks")
        ).withColumn("dl", F.size("_toks").cast("bigint"))
        tf = (
            d.select(cfg.id_col, "dl", F.explode("_toks").alias("term"))
            .groupBy("term", cfg.id_col, "dl")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
            .withColumn("_tb", _term_bucket_col(F.col("term"), cfg.n_buckets))
            .withColumn("run", F.lit(run))
            .withColumn("batch", F.lit(int(batch_id)))
            # feeds the postings write AND the df aggregate
            .localCheckpoint()
        )

        def _dyn(df: DataFrame, dest: str, parts: tuple) -> None:
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*parts)
                .parquet(dest)
            )

        _dyn(tf, f"{base}/postings", ("_tb", "run", "batch"))
        _dyn(
            tf.groupBy("term", "_tb", "run", "batch").agg(
                F.count(F.lit(1)).cast("bigint").alias("df")
            ),
            f"{base}/terms",
            ("_tb", "run", "batch"),
        )
        _dyn(
            d.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.coalesce(F.sum("dl"), F.lit(0))
                .cast("bigint")
                .alias("total_len"),
            )
            .withColumn("run", F.lit(run))
            .withColumn("batch", F.lit(int(batch_id)))
            .coalesce(1),
            f"{base}/stats",
            ("run", "batch"),
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
