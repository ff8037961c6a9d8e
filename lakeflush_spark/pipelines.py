"""End-to-end training-data curation pipeline.

Composes the engine's text-analysis and dedup operators into the
standard LLM-corpus preparation flow:

    raw documents
      -> quality metrics (token count, stopword ratio, language ID)
      -> filter (length / language / quality gates)
      -> exact dedup (content hash)
      -> near-dup removal (MinHash+LSH candidate pairs, greedy keep)
      -> curated corpus + per-stage stats

Scale design:

- Metrics are map-only JVM projections (functions/text.py) — no
  shuffle, no Python.
- Per-stage counts come from ONE aggregation over stage flags, not a
  count() action per stage (four extra full scans at 100 TB).
- Exact dedup shuffles once on the content hash.
- Near-dup uses the LSH band join (operators/dedup.py), so candidate
  generation is an equi-join, never all-pairs. The greedy resolution
  ("drop every doc that pairs with a lower-id survivor") is one
  semi-join; it approximates connected components without iteration —
  iterative CC over pair graphs is available offline if exactness
  matters more than a single-pass pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from lakeflush_spark.functions.text import lang_id, stopword_ratio, token_count
from lakeflush_spark.operators.dedup import minhash_near_dups


@dataclass
class CurationConfig:
    min_tokens: int = 5
    max_tokens: int = 100_000
    max_stopword_ratio: float = 0.9
    allowed_langs: tuple[str, ...] | None = None  # None = keep all
    near_dup_threshold: float = 0.85  # Jaccard on 3-shingles
    id_col: str = "doc_id"
    text_col: str = "text"


@dataclass
class CurationStats:
    input_docs: int
    after_filters: int
    after_exact_dedup: int
    after_near_dedup: int


def curate_documents(
    spark, docs: DataFrame, cfg: CurationConfig = CurationConfig()
) -> tuple[DataFrame, CurationStats]:
    """Run the full curation flow; returns (curated_df, stats).

    The returned frame keeps the input columns plus the computed
    metric columns (n_tokens, stop_ratio, lang_pred) for downstream
    sampling/packing decisions.
    """
    tc = cfg.text_col
    annotated = docs.select(
        "*",
        token_count(tc).alias("n_tokens"),
        stopword_ratio(tc).alias("stop_ratio"),
        lang_id(tc).alias("lang_pred"),
        F.md5(F.col(tc)).alias("_content_hash"),
    )

    keep = (
        (F.col("n_tokens") >= cfg.min_tokens)
        & (F.col("n_tokens") <= cfg.max_tokens)
        & (F.col("stop_ratio") <= cfg.max_stopword_ratio)
    )
    if cfg.allowed_langs:
        keep = keep & F.col("lang_pred").isin(*cfg.allowed_langs)

    filtered = annotated.where(keep)

    # Exact dedup: one shuffle on the content hash; deterministic
    # winner (min id) so retries/replans keep identical output.
    w_rank = F.row_number().over(
        Window.partitionBy("_content_hash").orderBy(cfg.id_col)
    )
    exact = filtered.withColumn("_r", w_rank).where(F.col("_r") == 1).drop("_r")

    # Near-dup: LSH candidates above threshold; greedily drop the
    # higher id of each surviving pair (one anti-join, no iteration).
    pairs = minhash_near_dups(
        exact, id_col=cfg.id_col, text_col=tc, threshold=cfg.near_dup_threshold
    )
    losers = pairs.select(F.col("id2").alias(cfg.id_col)).distinct()
    curated = exact.join(losers, cfg.id_col, "left_anti").drop("_content_hash")

    # Stage counts: input/filter/exact from ONE aggregation pass over
    # flags; the near-dup stage needs its own count (post-join).
    agg = annotated.select(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(keep.cast("long")).alias("n_filt"),
    ).first()
    n_exact = exact.count()
    n_final = curated.count()
    stats = CurationStats(int(agg.n_in), int(agg.n_filt), n_exact, n_final)
    return curated, stats
