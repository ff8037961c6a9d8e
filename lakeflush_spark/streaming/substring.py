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

Store maintenance (r8 — the sibling-store kit, per round-7 verdict):
``fp_prefix_partitions`` partitions the store by the first two hex
chars of the fingerprint (256 ``_fp=xx`` dirs under each (run,
batch)), so a trickle batch PARTITION-PRUNES its history scan to the
prefixes it touches instead of reading the whole O(corpus-age) store
— the digest store's ``_dp`` recipe. Counts are summable, so
:func:`compact_fp_store` merges each run's per-batch rows offline
into one row per fingerprint (under a synthetic ``batch=-1`` that
replay exclusion and dynamic overwrite can never touch), bounding
the store at O(distinct passages) regardless of age.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.operators.substring_dedup import (
    anchored_span_fps,
    strip_spans_against,
)
from lakeflush_spark.streaming.dedup import (
    _cfg_stream,
    _read_store,
    _run_tag,
    _sized,
)


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
    #: True = additionally partition the fp store by the first two hex
    #: chars of the fingerprint (256 ``_fp=xx`` partitions under each
    #: (run, batch)); each micro-batch then PARTITION-PRUNES its
    #: history scan to the prefixes it actually touches — a trickle
    #: batch reads ~its-prefix-share of the store instead of all of
    #: it, and a huge batch (all 256 prefixes) degrades gracefully to
    #: the full scan. Must be constant over a store's lifetime (the
    #: layout is on disk; guarded like the sibling stores' knobs).
    fp_prefix_partitions: bool = False
    #: source file format: parquet (default) or the reference lake's
    #: bundle formats json/csv, or raw text (see ``open_file_stream``)
    source_format: str = "parquet"
    #: options for the source reader (schema inference AND the stream),
    #: e.g. {"header": "true"} for CSV lakes
    source_options: dict | None = None
    max_files_per_trigger: int | None = None


def pruned_fp_history(
    hist: DataFrame,
    batch_counts: DataFrame,
    *,
    fp_dir: str,
    fp_prefix_partitions: bool,
) -> DataFrame:
    """The fp store scanned — never shuffled — down to this batch's
    fingerprints: layout fail-fast (a flipped ``fp_prefix_partitions``
    config vs the on-disk store), optional ``_fp`` partition
    ELIMINATION (bounded ≤256-value collect over the caller-pinned
    ``batch_counts`` drives the directory prune), then the broadcast
    semi-probe + per-fp sum. Returns ``(fp, _hn)`` history counts."""
    if ("_fp" in hist.columns) != fp_prefix_partitions:
        have = "prefix-partitioned" if "_fp" in hist.columns else "flat"
        raise ValueError(
            f"{fp_dir} is a {have} store but "
            f"fp_prefix_partitions={fp_prefix_partitions} — the layout "
            "must stay constant for a store's life; flip the config "
            "back or rebuild the store"
        )
    if fp_prefix_partitions and "_fp" in hist.columns:
        # partition-value inference types an ALL-numeric prefix dir set
        # as int (a small store can hold only "00".."99" prefixes —
        # found by the r9 property suite); normalize back to the
        # documented 2-char hex string so the prune, downstream layout
        # checks, and consumers always see one type. (Spark's literal
        # coercion makes the isin match either way; the normalization
        # is for type stability, not match correctness.)
        if dict(hist.dtypes)["_fp"] != "string":
            hist = hist.withColumn(
                "_fp", F.lpad(F.col("_fp").cast("string"), 2, "0")
            )
        prefixes = [
            r._fp
            for r in batch_counts.select(
                F.substring("fp", 1, 2).alias("_fp")
            ).distinct().collect()
        ]
        hist = hist.where(F.col("_fp").isin(prefixes))
    return (
        hist.join(F.broadcast(batch_counts.select("fp")), "fp", "semi")
        .groupBy("fp")
        .agg(F.sum("n").alias("_hn"))
    )


def fp_store_frame(
    batch_counts: DataFrame, fp_prefix_partitions: bool
) -> tuple[DataFrame, tuple[str, ...]]:
    """This batch's fp-store rows (``fp, n`` + ``_fp`` when
    prefix-partitioned) and the extra partition columns (beyond
    run/batch) to write with."""
    if fp_prefix_partitions:
        return (
            batch_counts.withColumn("_fp", F.substring("fp", 1, 2)),
            ("_fp",),
        )
    return batch_counts, ()


def compact_fp_store(spark: SparkSession, fp_dir: str, dest_dir: str) -> None:
    """Offline compaction of a boilerplate fp store: merge each run's
    per-batch occurrence counts into ONE row per fingerprint and write
    the result to ``dest_dir`` (must not exist — compaction never
    rewrites a store in place while streams may be reading it; swap
    ``cfg.fp_dir`` to the compacted copy between runs). Counts are
    summable, so the merge is lossless: every future threshold
    decision is identical against the compacted copy.

    Replay safety: each run's HIGHEST batch partition is kept
    VERBATIM — only that batch can be a crashed attempt awaiting
    foreachBatch replay, and a replay must still find (and overwrite /
    exclude) its own ``(run, batch)`` partition. Everything below it
    is committed history and merges into a synthetic ``batch=-1``
    partition, which replay exclusion (batch ids are ≥0) and dynamic
    overwrite can never touch. Re-compacting later folds the existing
    ``batch=-1`` rows in again — compaction is idempotent and
    composable. The ``_fp`` prefix layout, when present, is preserved
    (recomputed for merged rows), so partition elimination keeps
    working against the compacted copy."""
    df = spark.read.option("basePath", fp_dir).parquet(fp_dir)
    # stable partition-column types regardless of inference (see
    # dedup._read_store) — the max-batch window and the rewritten
    # layout both assume the contract types
    df = df.withColumn("run", F.col("run").cast("string")).withColumn(
        "batch", F.col("batch").cast("bigint")
    )
    has_fp_parts = "_fp" in df.columns
    maxb = df.groupBy("run").agg(F.max("batch").alias("_mb"))
    tagged = df.join(F.broadcast(maxb), "run")
    keep = tagged.where(F.col("batch") == F.col("_mb")).select(
        "fp", "n", "run", "batch"
    )
    merged = (
        tagged.where(F.col("batch") != F.col("_mb"))
        .groupBy("run", "fp")
        .agg(F.sum("n").alias("n"))
        .withColumn("batch", F.lit(-1))
        .select("fp", "n", "run", "batch")
    )
    out = keep.unionByName(merged)
    parts = ["run", "batch"]
    if has_fp_parts:
        out = out.withColumn("_fp", F.substring("fp", 1, 2))
        parts.append("_fp")
    out.write.mode("error").partitionBy(*parts).parquet(dest_dir)


def boilerplate_stream(
    spark: SparkSession, cfg: StreamBoilerplateConfig, schema=None
):
    """Start the boilerplate-strip stream (``Trigger.AvailableNow``).
    Returns the StreamingQuery; ``awaitTermination()`` it. Read
    rewritten docs (+ ``n_stripped``) from ``cfg.dest_dir``."""
    stream = _cfg_stream(spark, cfg, schema)
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
                hist_counts = pruned_fp_history(
                    hist,
                    batch_counts,
                    fp_dir=cfg.fp_dir,
                    fp_prefix_partitions=cfg.fp_prefix_partitions,
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
            # size store files to data (streaming/dedup._sized note);
            # batch_counts is pinned, so its count is a cache scan
            n_fp = batch_counts.count()
            (
                out.withColumn("run", F.lit(run))
                .withColumn("batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run", "batch")
                .parquet(cfg.dest_dir)
            )
            store_rows, extra_parts = fp_store_frame(
                batch_counts, cfg.fp_prefix_partitions
            )
            (
                _sized(
                    store_rows.withColumn("run", F.lit(run)).withColumn(
                        "batch", F.lit(int(batch_id))
                    ),
                    n_fp,
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run", "batch", *extra_parts)
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
