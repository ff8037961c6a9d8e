"""Cross-corpus decontamination (train/eval n-gram overlap removal).

The reference has no notion of corpus hygiene (its records are opaque
strings — SURVEY §2.B); this module adds the standard LLM-training
decontamination pass: drop (or flag) every training document that
shares word n-grams with a held-out evaluation set, the published
procedure from the GPT-3 / PaLM training-data reports (13-gram overlap
on a lowercased whitespace tokenization — ``F.lower`` is applied
before shingling here, and the DuckDB oracle twin mirrors it).

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
- ``decontaminate`` materializes the (small) hit set ONCE by default
  (``materialize=True`` → ``persist()``): the three returned frames
  share the probe-join lineage, so without it consuming all three
  would re-run the full corpus probe up to three times. Call
  ``DecontamResult.unpersist()`` when done.

N-grams are hashed with the engine-wide md5→32-bit scheme
(``functions.text.token_hash``), so the broadcast carries 8-byte
hashes, not gram strings, and the DuckDB oracle recomputes identical
values (``plans/decontam_queries.py``; hash collisions are
deterministic and identical in both engines). The hash array is
re-``array_distinct``-ed AFTER hashing: within-doc 32-bit collisions
(possible for very long docs) would otherwise leave duplicate hashes
in the "set" and overcount ``n_common``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from lakeflush_spark.operators.dedup import shingle_hash_set

#: production default — the published 13-gram decontamination window.
#: Tests (`tests/test_decontaminate.py`) and the contract query
#: (`plans/decontam_queries.py`, q61) use n=5 because the synthetic
#: docs are only 10–99 tokens long with a tiny vocabulary.
DECONTAM_N = 13


def ngram_hash_set(text: Column | str, n: int = DECONTAM_N) -> Column:
    """Distinct hashed lowercased word n-grams of a document (map-only).

    Lowercases first (the published decontamination procedure is
    case-insensitive). ``shingle_hash_set`` distincts AFTER hashing, so
    32-bit collisions cannot introduce duplicate elements into the set.
    """
    c = F.col(text) if isinstance(text, str) else text
    return shingle_hash_set(F.lower(c), k=n)


@dataclass
class DecontamResult:
    clean: DataFrame          # corpus rows with no eval overlap
    contaminated: DataFrame   # (id_col, n_common_grams) per flagged doc
    pairs: DataFrame          # (eval_id, corpus_id, n_common, jaccard) audit trail
    _hits: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the materialized hit set (see module docstring)."""
        if self._hits is not None:
            self._hits.unpersist()


def _gram_hits(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Exploded (corpus_id, _csz, eval_id, _esz, _g) contamination hits.

    The single expensive pass: corpus-side map-only explode feeding a
    BroadcastHashJoin against the (small, distinct-ed) eval gram table.
    Output size is bounded by the contamination volume, not corpus size.
    """
    from lakeflush_spark.functions.text import bind

    def gram_side(df: DataFrame, out_id: str, sz_name: str) -> DataFrame:
        # bind() evaluates the (expensive) n-gram hash set ONCE per
        # row; size and the exploded elements both read the bound
        # struct, so the shingle pipeline never re-runs. Docs with no
        # grams explode to zero rows (the old size>0 filter, for free).
        packed = bind(
            ngram_hash_set(text_col, n),
            lambda h: F.struct(F.size(h).alias("sz"), h.alias("g")),
        )
        return df.select(F.col(id_col).alias(out_id), packed.alias("_s")).select(
            out_id,
            F.col("_s.sz").alias(sz_name),
            F.explode("_s.g").alias("_g"),
        )

    ev_grams = gram_side(eval_docs, "eval_id", "_esz")
    co_grams = gram_side(corpus, "corpus_id", "_csz")
    # Broadcast the (small) eval gram table: the exploded corpus feeds
    # the join with no exchange; only hits reach downstream aggregations.
    # broadcast_eval=False degrades to a shuffle hash join for eval sets
    # too large for executor memory (both sides then exchange on _g).
    ev_side = F.broadcast(ev_grams) if broadcast_eval else ev_grams
    return co_grams.join(ev_side, "_g")


def _pairs_from_hits(hits: DataFrame) -> DataFrame:
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


def contamination_pairs(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(eval_id, corpus_id, n_common, jaccard) for every overlapping pair.

    ``n_common`` counts distinct shared gram hashes of the PAIR (both
    sides are true sets, so no double counting); ``jaccard`` is the
    exact Jaccard of the two hashed n-gram sets — planted near-dups
    score high, incidental single-gram collisions score near zero, so
    callers can threshold on either column.
    """
    return _pairs_from_hits(
        _gram_hits(
            corpus,
            eval_docs,
            id_col=id_col,
            text_col=text_col,
            n=n,
            broadcast_eval=broadcast_eval,
        )
    )


def eval_leak_report(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
    min_common: int = 1,
    broadcast_eval: bool = True,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """EVAL-side view of contamination (r6): one row per leaked eval
    item — ``(eval_id, n_corpus_hits, max_jaccard, top_corpus_id)``.
    Pass an existing :func:`contamination_pairs` /
    ``DecontamResult.pairs`` frame via ``pairs`` to reuse a probe the
    caller already ran (q61 does) instead of re-scanning the corpus.

    :func:`decontaminate` answers "which corpus docs must go";
    this answers the release team's OTHER question: "which eval items
    are compromised, how badly, and by what" — the artifact that
    decides whether to drop corpus docs or retire the eval item (an
    eval question leaked into thousands of corpus docs is effectively
    public and should be retired, not chased). ``top_corpus_id`` is
    the highest-jaccard offender (ties broken toward the larger id,
    deterministically). Same broadcast-probe plan as the pair frame:
    corpus never shuffles; the aggregation runs over pair-table-sized
    rows."""
    if pairs is None:
        pairs = contamination_pairs(
            corpus,
            eval_docs,
            id_col=id_col,
            text_col=text_col,
            n=n,
            broadcast_eval=broadcast_eval,
        )
    pairs = pairs.where(F.col("n_common") >= min_common)
    return pairs.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("n_corpus_hits"),
        F.max("jaccard").alias("max_jaccard"),
        F.max_by(
            F.col("corpus_id"), F.struct(F.col("jaccard"), F.col("corpus_id"))
        ).alias("top_corpus_id"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
    min_common: int = 1,
    materialize: bool = True,
    broadcast_eval: bool = True,
    eager: bool = False,
) -> DecontamResult:
    """Remove corpus docs sharing ≥ ``min_common`` word n-grams with eval.

    ``min_common`` thresholds the number of DISTINCT contaminated
    grams per corpus doc across the WHOLE eval set (a gram shared with
    K eval documents counts once, not K times). Returns the clean
    corpus, the flagged doc ids with their distinct-gram counts, and
    the pair-level audit frame.

    With ``materialize=True`` (default) the hit set is persisted so
    consuming all three outputs runs the corpus probe exactly once;
    neither pass shuffles corpus rows (both joins broadcast the small
    side). Call ``result.unpersist()`` when done.

    ``eager=True`` (r15) additionally localCheckpoints the hit set NOW
    instead of lazily persisting it: a caller that materializes all
    the outputs in ONE action (q61's four-branch union) would
    otherwise race several concurrent stages into the still-empty
    cache and recompute the corpus probe once per branch — the
    checkpoint runs it exactly once, and the (bounded, hits-sized)
    blocks free on GC with no unpersist() obligation.
    """
    hits = _gram_hits(
        corpus,
        eval_docs,
        id_col=id_col,
        text_col=text_col,
        n=n,
        broadcast_eval=broadcast_eval,
    )
    if materialize and eager:
        hits = hits.localCheckpoint()
    elif materialize:
        hits = hits.persist()
    pairs = _pairs_from_hits(hits)
    contaminated = (
        hits.groupBy("corpus_id")
        .agg(F.countDistinct("_g").alias("n_common_grams"))
        .where(F.col("n_common_grams") >= min_common)
        .select(F.col("corpus_id").alias(id_col), "n_common_grams")
    )
    clean = corpus.join(
        F.broadcast(contaminated.select(id_col)), id_col, "left_anti"
    )
    return DecontamResult(
        clean=clean,
        contaminated=contaminated,
        pairs=pairs,
        # checkpointed hits have no cache pin to release
        _hits=hits if (materialize and not eager) else None,
    )
