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
from pyspark.sql import Column, DataFrame, SparkSession

from lakeflush_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_NUM,
    _cap_hot_buckets,
    with_minhash,
)


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


# --------------------------------------------------------------------------
# Incremental NEAR-dup: LSH on arrival
# --------------------------------------------------------------------------


@dataclass
class StreamNearDupConfig:
    """Config for :func:`near_dup_stream`.

    ``threshold`` is the minimum ESTIMATED Jaccard (fraction of equal
    minhash components) for a pair to count as a near-dup. Signature
    agreement — not exact shingle Jaccard — is the verify step here
    because history stores signatures only (MINHASH_NUM bigints per
    doc), never bodies or shingle sets; an unbiased estimator whose
    error shrinks with MINHASH_NUM, the standard trade for dedup-on-
    arrival where re-reading old bodies per batch is not viable.
    """

    #: streaming source directory of parquet document files
    source_dir: str
    #: near-dup-free corpus destination (parquet, batch=N partitioned)
    dest_dir: str
    #: signature/band store directory (parquet, batch=N partitioned)
    sig_dir: str
    checkpoint_dir: str
    id_col: str = "doc_id"
    text_col: str = "text"
    threshold: float = 0.7
    #: cap on members per LSH bucket across batch+history (see
    #: operators/dedup._cap_hot_buckets — bounds the per-band join at
    #: cap² candidates under boilerplate skew); None = uncapped
    max_bucket: int | None = None
    max_files_per_trigger: int | None = None


def _sig_agreement(a: Column, b: Column) -> Column:
    """Fraction of equal minhash components — E[.] = Jaccard."""
    eq = F.zip_with(a, b, lambda x, y: F.when(x == y, 1).otherwise(0))
    return (
        F.aggregate(eq, F.lit(0), lambda acc, x: acc + x).cast("double")
        / F.lit(float(MINHASH_NUM))
    )


def near_dup_stream(spark: SparkSession, cfg: StreamNearDupConfig, schema=None):
    """Start the incremental NEAR-dup stream (``Trigger.AvailableNow``).

    Each micro-batch:

    1. map-only minhash signatures + band hashes for arriving docs
       (``operators/dedup.with_minhash`` — the batch operators' exact
       signature math, so batch and stream agree on what "near" means);
    2. WITHIN-batch greedy resolution: band equi-join inside the batch,
       signature-agreement verify, drop every doc pairing with a
       lower-id doc (the same greedy semantics as
       ``pipelines.curate_documents`` round 0);
    3. AGAINST-history: survivors' band rows equi-join the persisted
       band store on (band_idx, band_hash), candidates verify against
       stored signatures, matching docs drop. Only (id, band, 8-byte
       hash) and (id, 16-bigint sig) rows ever join — bodies never
       shuffle, and the store is ~1e-3 the corpus bytes;
    4. survivors append bodies to ``dest_dir`` and signature+band rows
       to ``sig_dir``, both under ``batch=<id>`` partitions with
       dynamic overwrite — replayed batches replace their own output
       (see :func:`dedup_stream`; same exactly-once recipe), and
       history reads exclude the replaying batch's own partition.

    Scale: per-batch cost is the band equi-join of (batch bands) ×
    (batch+history bands) on 8-byte keys — linear-ish in arrivals,
    independent of corpus BODY size; ``cfg.max_bucket`` bounds
    boilerplate-skewed buckets exactly as in the batch LSH path. At
    very large history, partition the store by band hash prefix and
    bucket-sort it so the join co-partitions without a history
    shuffle; the store schema already supports that layout rewrite.
    """
    if schema is None:
        schema = spark.read.parquet(cfg.source_dir).schema
    reader = spark.readStream.schema(schema)
    if cfg.max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    stream = reader.parquet(cfg.source_dir)

    def _bands_long(keyed: DataFrame) -> DataFrame:
        return keyed.select(
            F.col(cfg.id_col).alias("doc"),
            F.col("_sig").alias("sig"),
            F.posexplode(
                F.array(*[F.col(f"_band{b}") for b in range(MINHASH_BANDS)])
            ).alias("band_idx", "bh"),
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        keyed = with_minhash(batch_df, text_col=cfg.text_col)
        new_bands = _bands_long(keyed).withColumn("hist", F.lit(False))

        have_history = os.path.isdir(cfg.sig_dir) and any(
            d.startswith("batch=") for d in os.listdir(cfg.sig_dir)
        )
        all_bands = new_bands
        if have_history:
            hist_bands = (
                sp.read.option("basePath", cfg.sig_dir)
                .parquet(cfg.sig_dir)
                .where(F.col("batch") != int(batch_id))
                .select("doc", "sig", "band_idx", "bh")
                .withColumn("hist", F.lit(True))
            )
            all_bands = new_bands.unionByName(hist_bands)
        all_bands = _cap_hot_buckets(
            all_bands, ["band_idx", "bh"], cfg.max_bucket, mode="drop"
        )
        # ONE equi-join covers both within-batch and against-history
        # pairing: new docs left, (new ∪ history) right. A new doc is
        # dropped iff it verifies against a history doc (any id) or a
        # lower-id doc of its own batch — the batch pipeline's greedy
        # round-0 semantics, so replaying the whole corpus as one batch
        # and streaming it in pieces drop the same documents (modulo
        # chains that greedy over-deletes either way).
        n, o = new_bands.alias("n"), all_bands.alias("o")
        dropped = (
            n.join(
                o,
                (F.col("n.band_idx") == F.col("o.band_idx"))
                & (F.col("n.bh") == F.col("o.bh"))
                & (F.col("o.hist") | (F.col("o.doc") < F.col("n.doc"))),
            )
            .where(_sig_agreement(F.col("n.sig"), F.col("o.sig")) >= cfg.threshold)
            .select(F.col("n.doc").alias(cfg.id_col))
            .distinct()
        )
        out = (
            keyed.join(dropped, cfg.id_col, "left_anti")
            .withColumn("batch", F.lit(int(batch_id)))
            .persist()
        )
        try:
            body_cols = [c for c in batch_df.columns] + ["batch"]
            (
                out.select(*body_cols)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(cfg.dest_dir)
            )
            (
                _bands_long(out)
                .withColumn("batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(cfg.sig_dir)
            )
        finally:
            out.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
