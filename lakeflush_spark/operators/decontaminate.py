"""Cross-corpus decontamination (train/eval n-gram overlap removal).

The reference has no notion of corpus hygiene (its records are opaque
strings — SURVEY §2.B); this module adds the standard LLM-training
decontamination pass: drop (or flag) every training document that
shares a word n-gram with a held-out evaluation set, the published
procedure from the GPT-3 / PaLM training-data reports (13-gram overlap
on a lowercased whitespace tokenization).

Scale design — the corpus NEVER shuffles:

- Eval-set n-grams are tiny relative to a 100 TB corpus (benchmarks
  are MBs). They are distinct-ed and **broadcast**.
- The corpus side is a map-only projection (distinct n-gram hash set
  per doc) followed by an explode that feeds a **BroadcastHashJoin**
  directly — no exchange on the corpus side. Only MATCHING (doc,
  gram) rows survive into the aggregation, so the one shuffle in the
  plan carries just the contaminated hits (≈0 rows on a clean corpus).
- The final removal is a broadcast left-anti join on the contaminated
  id set (bounded by the number of contaminated docs, not corpus
  size).

N-grams are hashed with the engine-wide md5→32-bit scheme
(``functions.text.token_hash``), so the broadcast carries 8-byte
hashes, not gram strings, and the DuckDB oracle can recompute
identical values (hash collisions are deterministic and identical in
both engines).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from lakeflush_spark.operators.dedup import shingle_hash_set

#: production default — the published 13-gram decontamination window.
#: Tests and the contract query use smaller n because the synthetic
#: docs are only 10–99 tokens long.
DECONTAM_N = 13


def ngram_hash_set(text: Column | str, n: int = DECONTAM_N) -> Column:
    """Distinct hashed word n-grams of a document (map-only)."""
    return shingle_hash_set(text, k=n)


@dataclass
class DecontamResult:
    clean: DataFrame          # corpus rows with no eval overlap
    contaminated: DataFrame   # (id_col, n_common_grams) per flagged doc
    pairs: DataFrame          # (eval_id, corpus_id, n_common, jaccard) audit trail


def contamination_pairs(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
) -> DataFrame:
    """(eval_id, corpus_id, n_common, jaccard) for every overlapping pair.

    jaccard is the exact Jaccard of the two hashed n-gram sets —
    planted near-dups score high, incidental single-gram collisions
    score near zero, so callers can threshold on either column.
    """
    ev = eval_docs.select(
        F.col(id_col).alias("eval_id"),
        ngram_hash_set(text_col, n).alias("_eg"),
    ).where(F.size("_eg") > 0)
    co = corpus.select(
        F.col(id_col).alias("corpus_id"),
        ngram_hash_set(text_col, n).alias("_cg"),
    ).where(F.size("_cg") > 0)

    ev_grams = ev.select("eval_id", F.size("_eg").alias("_esz"),
                         F.explode("_eg").alias("_g"))
    co_grams = co.select("corpus_id", F.size("_cg").alias("_csz"),
                         F.explode("_cg").alias("_g"))
    # Broadcast the (small) eval gram table: the exploded corpus feeds
    # the join with no exchange; only hits reach the aggregation.
    hits = co_grams.join(F.broadcast(ev_grams), "_g")
    return (
        hits.groupBy("eval_id", "corpus_id", "_esz", "_csz")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            "eval_id",
            "corpus_id",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("_esz") + F.col("_csz") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
    min_common: int = 1,
) -> DecontamResult:
    """Remove corpus docs sharing ≥ ``min_common`` word n-grams with eval.

    Returns the clean corpus, the flagged doc ids with their hit
    counts, and the pair-level audit frame. The corpus is scanned
    once for the probe and once for the anti-join; neither pass
    shuffles corpus rows (both joins broadcast the small side).
    """
    pairs = contamination_pairs(
        corpus, eval_docs, id_col=id_col, text_col=text_col, n=n
    )
    contaminated = (
        pairs.groupBy("corpus_id")
        .agg(F.sum("n_common").alias("n_common_grams"))
        .where(F.col("n_common_grams") >= min_common)
        .select(F.col("corpus_id").alias(id_col), "n_common_grams")
    )
    clean = corpus.join(
        F.broadcast(contaminated.select(id_col)), id_col, "left_anti"
    )
    return DecontamResult(clean=clean, contaminated=contaminated, pairs=pairs)
