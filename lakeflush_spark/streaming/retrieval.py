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


@dataclass
class StreamVecIndexConfig:
    #: streaming source directory of embedding files
    source_dir: str
    #: the STREAM-OWNED index directory: ``vectors/`` is written only
    #: by this stream (always partitioned ``(_cp, run, batch)`` — a
    #: batch-built depth-1 layout cannot mix with replay partitions in
    #: one tree, Spark rejects conflicting partition depths), sidecars
    #: are copied from ``quantizer_index_dir`` at first start so the
    #: directory is self-contained for every search entry point
    index_dir: str
    checkpoint_dir: str
    #: a BUILT index (build_ivf_index / quantize_index /
    #: pq_encode_index) whose frozen centroids (+ codebooks) define
    #: assignment and the stored layout (float / int8 / PQ follows the
    #: parent's vectors schema); never retrained by the stream
    quantizer_index_dir: str = ""
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    source_format: str = "parquet"
    source_options: dict | None = None
    max_files_per_trigger: int | None = None


def ivf_index_stream(
    spark: SparkSession, cfg: StreamVecIndexConfig, schema=None
):
    """Vector indexing on arrival (r14) — the ANN sibling of
    :func:`bm25_index_stream`: each micro-batch of embeddings assigns
    MAP-ONLY against the frozen centroid sidecar of
    ``cfg.quantizer_index_dir`` (the ``append_ivf_index`` posture —
    no retraining; drift remedy is rebuild-and-swap) and lands under
    ``cfg.index_dir/vectors`` partitioned by ``(_cp, run, batch)``
    with dynamic partition overwrite, so a crashed batch's replay
    replaces its own prior attempt instead of double-appending.
    ``_cp`` stays the LEADING partition — searches (``ivf_search`` /
    ``ivfpq_search`` / the hybrid ANN leg) prune directories exactly
    as against a batch-built index, and their column selects drop the
    replay columns.

    The stream OWNS ``index_dir/vectors`` (like ``bm25_index_stream``
    owns its index): corpus history arrives through the stream;
    serving a pre-existing batch-built store alongside arrivals is
    batch ``append_ivf_index``'s job. On first start the quantizer's
    ``centroids/`` (and ``codebooks/`` for PQ parents) are copied in,
    so the maintained directory serves standalone. All three layouts
    stream — the parent's vectors schema decides: float rows land as
    ``v``, int8 parents quantize arrivals, PQ parents encode them
    with the frozen codebooks (resolved once at stream start). Caller
    contract: arriving ids must be new (exact dedup —
    ``streaming/dedup.py`` — is the upstream stage).

    At 100 TB: per batch this is one broadcast centroid scan over the
    micro-batch only + a partitioned write; history is never read.
    Compact offline with ``operators.similarity.compact_ivf_index``
    (it prunes the replay partitions) when per-batch file counts
    grow. After each batch the occupancy guard runs
    (parquet-metadata count only), so a quantizer outgrown by months
    of arrivals warns from the stream itself.

    Returns the StreamingQuery (``Trigger.AvailableNow``).
    """
    from lakeflush_spark.operators.similarity import (
        _nearest_cells,
        _pack_cells,
        _warn_if_index_outgrew_quantizer,
        prepare_vectors,
    )

    base = cfg.index_dir.rstrip("/")
    quant = (cfg.quantizer_index_dir or "").rstrip("/")
    if not quant:
        raise ValueError(
            "StreamVecIndexConfig.quantizer_index_dir is required — "
            "point it at a built index (build_ivf_index / "
            "pq_encode_index); the stream assigns against frozen "
            "sidecars, it cannot train them"
        )
    try:
        cents = spark.read.parquet(f"{quant}/centroids")
        cents.head(1)
    except Exception as exc:
        raise ValueError(
            f"{quant} is not a built IVF index (no centroids/ "
            "sidecar) — build_ivf_index (or pq_encode_index) first"
        ) from exc
    layout_cols = spark.read.parquet(f"{quant}/vectors").schema.names
    packed = _pack_cells(cents).localCheckpoint()
    codebooks = None
    if "codes" in layout_cols:
        from lakeflush_spark.operators.pq import read_codebooks

        codebooks = read_codebooks(spark, quant)
    # first start: copy the frozen sidecars so index_dir serves
    # standalone (ignore-existing makes restarts idempotent)
    cents.coalesce(1).write.mode("ignore").parquet(f"{base}/centroids")
    if codebooks is not None:
        spark.read.parquet(f"{quant}/codebooks").coalesce(1).write.mode(
            "ignore"
        ).parquet(f"{base}/codebooks")
    run = _run_tag(cfg.checkpoint_dir)
    stream = _cfg_stream(spark, cfg, schema)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        prepped = prepare_vectors(
            batch_df, id_col=cfg.id_col, vec_col=cfg.vec_col
        )
        indexed = _nearest_cells(prepped, packed, 1)
        if "qv" in layout_cols:
            from lakeflush_spark.functions.vectors import quantize_int8

            rows = indexed.select(
                "vid", "cell_id",
                quantize_int8(F.col("v")).alias("qv"), "nrm",
            )
        elif "codes" in layout_cols:
            from lakeflush_spark.operators.pq import encode_with_codebooks

            rows = indexed.select(
                "vid", "cell_id",
                encode_with_codebooks(F.col("v"), codebooks).alias("codes"),
                "nrm",
            )
        else:
            rows = indexed.select("vid", "cell_id", "v", "nrm")
        (
            rows.withColumn("_cp", F.pmod(F.col("cell_id"), F.lit(256)))
            .withColumn("run", F.lit(run))
            .withColumn("batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_cp", "run", "batch")
            .parquet(f"{base}/vectors")
        )
        _warn_if_index_outgrew_quantizer(spark, base)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
