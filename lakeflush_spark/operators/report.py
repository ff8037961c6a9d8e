"""Corpus data-card report: the per-source summary a training-data
release ships with (counts, token-budget contribution, length
quantiles, language mix, quality/dup-risk signals).

The reference has no analog (its records are opaque strings); every
published LLM-data pipeline ends in exactly this table — the "data
card" row per source that mixing weights (``operators/mixing.py``)
are negotiated against.

Scale stance: metrics are map-only JVM Column expressions from
``functions/text.py`` (no Python), feeding two map-side-combined
aggregation scans — groupBy(source) for the numeric card and
groupBy(source, lang) for the language mode (``percentile_approx``
sketches cannot be re-merged from a finer grouping in the DataFrame
API, hence two scans rather than one). Neither shuffles the corpus:
both exchanges carry |sources|(×|langs|) aggregate rows. Quantiles
use ``percentile_approx`` — the single-pass sketch built for this —
so the report never sorts the corpus. Nothing is collected
driver-side; the result is a DataFrame the caller writes next to the
corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame



def sketch_quantile_verdicts(
    values: DataFrame,
    card: DataFrame,
    value_col: str,
    qcols: dict[str, float],
    key: str = "source",
    accuracy: int = 10_000,
    slack_ranks: int = 2,
) -> DataFrame:
    """Per-``key`` boolean verdicts that a card's ``percentile_approx``
    quantiles honor the sketch's rank contract.

    The QuantileSummaries contract: the value returned for quantile q
    over n rows has rank r with |r - q*n| <= eps*n, eps = 1/accuracy.
    A sketch value v's exact rank window is [#{x < v}+1, #{x <= v}];
    the verdict per key is True iff, for every (card column -> q) in
    ``qcols``, that window intersects q*n ± (eps*n + slack_ranks) —
    the slack absorbs the rank-definition off-by-ones; a wrong sketch
    value is tens of ranks out.

    Scale stance: ONE scan of ``values`` with the |keys|-row card
    broadcast (map-side combined counts; no corpus shuffle). Built for
    verdict-row oracles (q60 'card_q') where the sketch's picked data
    points are not replayable in ANSI SQL; kept standalone so tests
    can plant a violating card value and watch the verdict flip.

    Returns one row per key: (``key``, ok boolean).
    """
    cols = list(qcols)
    ranks = (
        values.join(F.broadcast(card.select(key, *cols)), key)
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum((F.col(value_col) <= F.col(c)).cast("bigint")).alias(f"le_{c}")
                for c in cols
            ],
            *[
                F.sum((F.col(value_col) < F.col(c)).cast("bigint")).alias(f"lt_{c}")
                for c in cols
            ],
        )
    )
    ok = F.lit(True)
    for c, q in qcols.items():
        target = F.col("n") * q
        slack = F.col("n") / accuracy + slack_ranks
        ok = ok & (F.col(f"le_{c}") >= target - slack) & (
            F.col(f"lt_{c}") + 1 <= target + slack
        )
    return ranks.select(key, ok.alias("ok"))


def corpus_report(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    quantile_accuracy: int = 10_000,
    flag_profile: bool = True,
) -> DataFrame:
    """One row per source: doc/token counts, token-length quantiles
    (p10/p50/p90/p99 via ``percentile_approx``), corpus share, language
    mix (top language + its share), quality aggregates, and the
    published-filter profile (r9): per source, how many docs (and
    their tokens) fail the Gopher rules, the C4 page rules, and the
    MassiveText repetition rules — the "what would a cleanup delete"
    panel a data card ships. The flag expressions are the same
    map-only bitmasks the curation gates use (operators/quality.py),
    evaluated in the SAME single aggregation scan. The profile
    roughly doubles the per-doc scan cost (three bitmasks incl.
    top-k-gram folds) — ``flag_profile=False`` restores the pre-r9
    cheap card (the six columns then report 0).

    ``quantile_accuracy`` is ``percentile_approx``'s 1/eps knob
    (10_000 ⇒ ~0.01% rank error — sketch memory is O(accuracy), not
    O(corpus)). Deterministic given the input (no sampling).
    """
    import pyspark.sql.functions as F2

    from lakeflush_spark.functions.text import (
        lang_id,
        quality_score_from,
        stopword_ratio_from,
    )
    from lakeflush_spark.operators.quality import (
        _c4_flags_from_lines,
        _gopher_flags_from,
        _mt_flags_from_views,
        quality_views_inline,
    )

    tc = F.col("_nt")

    # FUSED per-doc scan (r10): one inline() generator binds the shared
    # token/word/line/paragraph arrays (and, with the flag profile, the
    # gram arrays + top-k coverages) once per row — the un-fused
    # seven-column projection re-split the text per column and ran the
    # coverage folds inside the mt bitmask from scratch. Values are
    # bit-identical (same arithmetic over bound views); the q60
    # 'card'/'card_top'/'card_flags' oracle hashes pin that.
    #
    # _lang is NOT in the generator (r11): the language-mode
    # aggregation below is a SECOND scan reading only the language
    # column, and a generator defeats column pruning — with _lang
    # inside, that scan re-ran the whole flags panel (coverage folds
    # included) per row to extract one field; measured ~25% of the
    # whole report's cost. A direct lang_id projection prunes to one
    # tokenize per row on that scan.
    def build(v: dict) -> F2.Column:
        flags = (
            [
                (_gopher_flags_from(v["raw"], v["ws"], v["ls"]) != 0).alias("_gf"),
                (_c4_flags_from_lines(v["ls"], v["raw"]) != 0).alias("_cf"),
                (_mt_flags_from_views(v) != 0).alias("_mf"),
            ]
            if flag_profile
            else [F.lit(False).alias(c) for c in ("_gf", "_cf", "_mf")]
        )
        return F.struct(
            F.size(v["tk"]).cast("bigint").alias("_nt"),
            stopword_ratio_from(v["tk"]).alias("_sw"),
            quality_score_from(v["tk"]).alias("_q"),
            *flags,
        )

    annotated = docs.select(
        F.col(source_col).alias("source"),
        F.inline(quality_views_inline(build, text_col, covs=flag_profile)),
    )
    lang_annotated = docs.select(
        F.col(source_col).alias("source"), lang_id(text_col).alias("_lang")
    )

    def _flagged(flag: str, name: str) -> list:
        return [
            F.sum(F.col(flag).cast("bigint")).alias(f"n_{name}_flagged"),
            F.sum(F.when(F.col(flag), tc).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"{name}_flagged_tokens"),
        ]

    per_source = annotated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).cast("bigint").alias("n_tokens"),
        F.percentile_approx(tc, [0.1, 0.5, 0.9, 0.99], quantile_accuracy).alias(
            "_tq"
        ),
        F.round(F.avg("_sw"), 4).alias("avg_stopword_ratio"),
        F.round(F.avg("_q"), 4).alias("avg_quality"),
        *_flagged("_gf", "gopher"),
        *_flagged("_cf", "c4"),
        *_flagged("_mf", "mt"),
    )
    # language mode: a per-(source, lang) pre-aggregation (map-side
    # combined over the corpus) then max_by over |sources| × |langs|
    # rows — a second shuffle, but of a TINY frame, never the corpus.
    # Ties break deterministically toward the lexicographically larger
    # language of the tied count (max_by on the (count, lang) struct).
    lang_counts = (
        lang_annotated.groupBy("source", "_lang")
        .agg(F.count(F.lit(1)).alias("_lc"))
        .groupBy("source")
        .agg(
            F.max_by(
                F.struct(F.col("_lc"), F.col("_lang")), F.struct(F.col("_lc"), F.col("_lang"))
            ).alias("_top"),
            F.sum("_lc").alias("_tot"),
        )
        .select(
            "source",
            F.col("_top._lang").alias("top_lang"),
            F.round(F.col("_top._lc") / F.col("_tot"), 4).alias("top_lang_share"),
        )
    )
    # token_share divisor: a window sum over the ALREADY-AGGREGATED
    # |sources|-row frame (r14) — the previous
    # ``crossJoin(per_source.select(F.sum(...)))`` re-ran the whole
    # flags-panel generator scan over the corpus just to total one
    # bigint column (the plan showed the heavy Generate+Scan twice,
    # unshared; guide §2.4). Exact-integer sum over the same rows —
    # bit-identical shares. The empty OVER () frame is a
    # SinglePartition exchange of card rows only, never the corpus.
    from pyspark.sql import Window

    _all = F.sum("n_tokens").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    ).alias("_all")
    # eqNullSafe: a NULL source is a real group in both aggregations
    # (groupBy keeps it) — a plain equi-join would silently drop it
    # from the card while its tokens still inflate the share divisor
    lc = lang_counts.withColumnRenamed("source", "_lc_source")
    return (
        per_source.join(
            lc, per_source["source"].eqNullSafe(lc["_lc_source"])
        ).drop("_lc_source")
        .withColumn("_all", _all)
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_all"), 4).alias("token_share"),
            F.col("_tq")[0].cast("bigint").alias("tokens_p10"),
            F.col("_tq")[1].cast("bigint").alias("tokens_p50"),
            F.col("_tq")[2].cast("bigint").alias("tokens_p90"),
            F.col("_tq")[3].cast("bigint").alias("tokens_p99"),
            "avg_stopword_ratio",
            "avg_quality",
            "top_lang",
            "top_lang_share",
            "n_gopher_flagged",
            "gopher_flagged_tokens",
            "n_c4_flagged",
            "c4_flagged_tokens",
            "n_mt_flagged",
            "mt_flagged_tokens",
        )
        .orderBy("source")
    )
