"""Boilerplate-on-arrival: cross-document repeated-passage stripping
as a stream (r7) — the fourth dedup-on-arrival modality beside exact
digests, lexical LSH, and SemDedup (``streaming/dedup.py``,
``streaming/semdedup.py``).

Batch-mode repeated-passage detection
(``operators/substring_dedup.py``) needs the whole corpus to count a
passage's occurrences; on a stream, occurrence counts accumulate in a
persisted FINGERPRINT STORE instead. Per micro-batch:

1. **Probe.** Arriving docs fingerprint their content-anchored token
   windows (the winnowing/CDC anchor rule shared with the batch
   operator — same module, same ``_anchor_starts``), distinct per
   doc; one groupBy on the 16-byte fp yields this batch's per-passage
   doc counts.
2. **History counts.** The fp store is scanned, never shuffled — the
   batch's (few, already-aggregated) fingerprints broadcast into a
   semi-probe, and only matching store rows aggregate. Untouched
   fingerprints cost nothing.
3. **Hot set.** A passage is boilerplate once
   ``history + batch occurrences >= min_docs``.
4. **Strip.** Arriving docs rewrite through
   ``operators/substring_dedup.strip_spans_against`` — tokens covered
   by a hot anchored window are removed, ``n_stripped`` counts them.
   Documents are never dropped.
5. Batch fp counts append to the store and rewritten docs land in the
   dest, both under the ``(run, batch)`` dynamic-overwrite
   exactly-once layout the other streams share.

SEMANTICS — on-arrival is prospective, not retroactive: the
``min_docs``-th copy of a passage (and every later one) arrives
already-stripped, but EARLIER deliveries keep their copy (they were
written before the passage crossed the threshold). A continuously-fed
corpus therefore converges to "at most ``min_docs - 1`` surviving
copies of any boilerplate block + stripped tails"; run the batch
``strip_repeated_spans`` over the accumulated dest when a release
needs the retroactive rewrite too. Store counts describe ARRIVED
text (pre-strip): a passage seen k times has k recorded occurrences
even though later deliveries no longer carry it — that is what makes
the threshold monotone.

Store size: one row per (batch, distinct passage fingerprint) — a
16-byte fp + a count; the same footprint class as the digest store.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.operators.substring_dedup import (
    anchored_span_fps,
    strip_spans_against,
)
from lakeflush_spark.streaming.dedup import _read_store, _run_tag


@dataclass
class StreamBoilerplateConfig:
    #: streaming source directory of parquet document files
    source_dir: str
    #: stripped-docs destination (parquet, run/batch partitioned)
    dest_dir: str
    #: fingerprint store (fp, n; run/batch partitioned)
    fp_dir: str
    checkpoint_dir: str
    id_col: str = "doc_id"
    text_col: str = "text"
    #: the batch operator's knobs, same semantics (window tokens per
    #: fingerprinted span; 1/stride anchor density; occurrence
    #: threshold — counted ACROSS the store's whole life)
    window: int = 50
    stride: int = 8
    min_docs: int = 2
    max_files_per_trigger: int | None = None


def boilerplate_stream(
    spark: SparkSession, cfg: StreamBoilerplateConfig, schema=None
):
    """Start the boilerplate-strip stream (``Trigger.AvailableNow``).
    Returns the StreamingQuery; ``awaitTermination()`` it. Read
    rewritten docs (+ ``n_stripped``) from ``cfg.dest_dir``."""
    if schema is None:
        schema = spark.read.parquet(cfg.source_dir).schema
    reader = spark.readStream.schema(schema)
    if cfg.max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    stream = reader.parquet(cfg.source_dir)
    run = _run_tag(cfg.checkpoint_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        spans = batch_df.select(
            F.col(cfg.id_col).alias("_id"),
            F.explode(
                anchored_span_fps(cfg.text_col, cfg.window, cfg.stride)
            ).alias("fp"),
        )
        # pinned: feeds the hot-set probe AND the store append
        batch_counts = (
            spans.groupBy("fp")
            .agg(F.countDistinct("_id").alias("n"))
            .persist()
        )
        try:
            hist = _read_store(sp, cfg.fp_dir, batch_id, run)
            if hist is not None:
                hist_counts = (
                    hist.join(
                        F.broadcast(batch_counts.select("fp")), "fp", "semi"
                    )
                    .groupBy("fp")
                    .agg(F.sum("n").alias("_hn"))
                )
                totals = batch_counts.join(hist_counts, "fp", "left").select(
                    "fp",
                    (F.col("n") + F.coalesce(F.col("_hn"), F.lit(0))).alias(
                        "_tot"
                    ),
                )
            else:
                totals = batch_counts.select("fp", F.col("n").alias("_tot"))
            hot = totals.where(F.col("_tot") >= cfg.min_docs).select("fp")
            out = strip_spans_against(
                batch_df,
                hot,
                id_col=cfg.id_col,
                text_col=cfg.text_col,
                window=cfg.window,
                stride=cfg.stride,
            )
            (
                out.withColumn("run", F.lit(run))
                .withColumn("batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run", "batch")
                .parquet(cfg.dest_dir)
            )
            (
                batch_counts.withColumn("run", F.lit(run))
                .withColumn("batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run", "batch")
                .parquet(cfg.fp_dir)
            )
        finally:
            batch_counts.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
