"""Incremental ingest dedup: exact-dedup each arriving micro-batch
against everything ingested before it.

The batch dedup operators (``operators/dedup.py``) assume the corpus
is at rest; a continuously-fed training-data lake needs dedup ON
ARRIVAL — a document seen last week must not re-enter the corpus
today. The reference has no analog (it stops at bundle delivery);
this is the streaming face of ``exact_dedup_by_hash``:

1. every micro-batch first dedups WITHIN itself (min-id winner, the
   same digest-shuffle shape as the batch operator);
2. survivors are anti-joined against the persisted DIGEST STORE — a
   parquet table of 16-byte content digests, never document bodies;
3. genuinely-new documents append to the dest corpus and their
   digests append to the store, both under ``batch=<id>`` partitions
   written with DYNAMIC partition overwrite — a replayed micro-batch
   (foreachBatch is at-least-once) REPLACES its own output instead of
   duplicating it, the same exactly-once recipe as
   ``streaming/compaction.py``.

Scale stance: the per-batch cost is (batch digests) × (history
digests) — an anti-join on 16-byte keys with the batch side tiny, so
AQE broadcasts the batch side against the history scan; document
bodies never shuffle. At 100 TB of history, partition-prune the store
by digest prefix (write ``prefix=substr(digest,1,2)`` partitions and
join per-prefix) or front it with a Bloom filter — the store schema
(digest, batch) already supports both upgrades without rewriting
history.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


@dataclass
class StreamDedupConfig:
    #: streaming source directory of parquet document files
    source_dir: str
    #: deduped corpus destination (parquet, batch=N partitioned)
    dest_dir: str
    #: digest store directory (parquet, batch=N partitioned)
    digest_dir: str
    checkpoint_dir: str
    id_col: str = "doc_id"
    text_col: str = "text"
    max_files_per_trigger: int | None = None


def _batch_digests(df: DataFrame, cfg: StreamDedupConfig) -> DataFrame:
    # same injective single-column encoding as exact_dedup_by_hash
    s = F.col(cfg.text_col).cast("string")
    key = F.md5(
        F.when(s.isNull(), F.lit("N;")).otherwise(
            F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(";"), s)
        )
    )
    return df.withColumn("_digest", key)


def dedup_stream(spark: SparkSession, cfg: StreamDedupConfig, schema=None):
    """Start the incremental-dedup stream (``Trigger.AvailableNow``).

    ``schema`` defaults to the schema of the parquet files already in
    ``source_dir`` (streaming parquet sources require one).
    Returns the StreamingQuery; ``awaitTermination()`` it.
    """
    if schema is None:
        schema = spark.read.parquet(cfg.source_dir).schema
    reader = spark.readStream.schema(schema)
    if cfg.max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    stream = reader.parquet(cfg.source_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        keyed = _batch_digests(batch_df, cfg)
        # within-batch winner: min id per digest (map-side combinable)
        winners = (
            keyed.groupBy("_digest")
            .agg(F.min(cfg.id_col).alias(cfg.id_col))
            .select(cfg.id_col)
        )
        fresh = keyed.join(winners, cfg.id_col, "semi")
        # against-history: digest anti-join, bodies never shuffle.
        # Exclude THIS batch's own partition so a replay does not see
        # its previous (crashed) attempt as history.
        if os.path.isdir(cfg.digest_dir) and any(
            d.startswith("batch=") for d in os.listdir(cfg.digest_dir)
        ):
            seen = (
                sp.read.option("basePath", cfg.digest_dir)
                .parquet(cfg.digest_dir)
                .where(F.col("batch") != int(batch_id))
                .select("_digest")
            )
            fresh = fresh.join(seen, "_digest", "left_anti")
        # persist: consumed by BOTH writes, and the digest write must
        # see a snapshot computed BEFORE it starts replacing files
        # under the digest dir it was derived from
        out = fresh.withColumn("batch", F.lit(int(batch_id))).persist()
        try:
            (
                out.drop("_digest")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(cfg.dest_dir)
            )
            (
                out.select("_digest", "batch")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(cfg.digest_dir)
            )
        finally:
            out.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
