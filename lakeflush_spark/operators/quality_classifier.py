"""Classifier-based quality filtering — the GPT-3/LLaMA-family recipe
(Brown et al. 2020 appendix A; Touvron et al. 2023): train a linear
classifier that separates a trusted high-quality corpus from raw crawl
text, then keep raw documents the classifier scores as
reference-like.

The reference engine has no analog (opaque records); this completes
the engine's published-filter family: heuristic gates
(:mod:`operators.quality`), the CCNet-style LM gate
(:mod:`operators.lm_filter`), and this discriminative gate.

Design:

- **Features** are the engine's own per-doc quality panel
  (``text_quality_profile``): token/char counts (log-scaled), length,
  stopword/type-token/repetition ratios, top-k-gram coverage — all
  map-only JVM Columns, so FEATURE EXTRACTION runs at scan speed.
- **Training** uses ``pyspark.ml`` LogisticRegression (distributed
  LBFGS) over the labeled union of a positive (reference) and a
  negative (raw) sample. Training corpora are samples — thousands of
  rows, not the 100 TB corpus — so this is a small job.
- **Inference does NOT need pyspark.ml**: the fitted model is exported
  as a plain ``{feature: weight}`` dict, and ``quality_score_col``
  rebuilds the sigmoid as a pure Column expression (weights inlined as
  literals — effectively broadcast). Scoring the full corpus is one
  map-only projection; no model object ships to executors, no Python
  in the row path.

Determinism note: LBFGS training has no sampling; across partition
layouts the fitted weights agree to float-sum ordering (measured max
delta 1.4e-14 on a 13-vs-1 partition re-train) — reproducible in
practice, but not bit-pinned. Scores are IEEE-754 doubles and exp()
is not bit-specified across engines, which is why this operator is
unit-tested (separation + filter behavior) rather than
driver-hash-verified.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: profile columns used as features, with their scaling. Counts are
#: log1p-scaled (heavy-tailed); ratios enter as-is (already in [0,1]).
_LOG_FEATURES = ("n_tokens", "n_chars", "n_bpe_tokens")
_RATIO_FEATURES = (
    "avg_tok_len",
    "stop_ratio",
    "distinct_ratio",
    "dup3_ratio",
    "dup_line_ratio",
    "dup_line_char_ratio",
    "dup_para_ratio",
    "dup_para_char_ratio",
    "top2_char_ratio",
    "top3_char_ratio",
    "top4_char_ratio",
)
FEATURE_COLS: tuple[str, ...] = _LOG_FEATURES + _RATIO_FEATURES
INTERCEPT_KEY = "__intercept__"


def _feature_expr(name: str) -> Column:
    if name in _LOG_FEATURES:
        return F.log1p(F.col(name).cast("double"))
    return F.col(name).cast("double")


def _view_feature_exprs(v: dict, name: str) -> Column:
    """Feature ``name`` from a ``quality_views_inline`` bound-view
    dict — the single source both the featurizer and
    quality_score_from_text substitute from, so training and gate
    scoring cannot drift. Built lazily PER FEATURE so callers with
    zero-weight features never construct (or bind) what they skip."""
    from lakeflush_spark.functions.text import (
        avg_token_len_4dp_from,
        bpe_token_count,
        distinct_token_ratio_4dp_from,
        dup_gram_ratio_4dp_from,
        dup_unit_char_ratio_4dp_from,
        dup_unit_ratio_4dp_from,
        stopword_ratio_4dp_from,
        top_kgram_char_ratio_4dp_from,
    )

    nch = lambda: F.length(v["raw"]).cast("bigint")  # noqa: E731
    builders = {
        "n_tokens": lambda: F.size(v["tk"]).cast("bigint").cast("double"),
        "n_chars": lambda: F.length(v["raw"]).cast("double"),
        "n_bpe_tokens": lambda: bpe_token_count(v["raw"]).cast("double"),
        "avg_tok_len": lambda: avg_token_len_4dp_from(v["tk"]),
        "stop_ratio": lambda: stopword_ratio_4dp_from(v["tk"]),
        "distinct_ratio": lambda: distinct_token_ratio_4dp_from(v["tk"]),
        "dup3_ratio": lambda: dup_gram_ratio_4dp_from(v["g3"]),
        "dup_line_ratio": lambda: dup_unit_ratio_4dp_from(v["ls"]),
        "dup_line_char_ratio": lambda: dup_unit_char_ratio_4dp_from(v["ls"]),
        "dup_para_ratio": lambda: dup_unit_ratio_4dp_from(v["ps"]),
        "dup_para_char_ratio": lambda: dup_unit_char_ratio_4dp_from(v["ps"]),
        "top2_char_ratio": lambda: top_kgram_char_ratio_4dp_from(v["c2"], nch()),
        "top3_char_ratio": lambda: top_kgram_char_ratio_4dp_from(v["c3"], nch()),
        "top4_char_ratio": lambda: top_kgram_char_ratio_4dp_from(v["c4"], nch()),
    }
    return builders[name]()


#: features needing the gram/coverage bind level of quality_views_inline
_COV_FEATURES = frozenset(
    {"dup3_ratio", "top2_char_ratio", "top3_char_ratio", "top4_char_ratio"}
)


def _scaled(name: str, feat: Column) -> Column:
    return F.log1p(feat) if name in _LOG_FEATURES else feat


def _featurized(docs: DataFrame, text_col: str) -> DataFrame:
    """``_f_*`` feature columns computed straight from the text — NOT
    via text_quality_profile, so an input frame already carrying
    profile-named columns (curate_documents output keeps n_tokens /
    stop_ratio / lang_pred) composes without AMBIGUOUS_REFERENCE.
    FUSED (r10): one inline() generator over the shared text views —
    each split/gram/coverage evaluates once per row instead of once
    per feature column. Values bit-identical to the un-fused form."""
    from lakeflush_spark.operators.quality import quality_views_inline

    def build(v: dict) -> Column:
        return F.struct(
            *[
                _scaled(c, _view_feature_exprs(v, c)).alias(f"_f_{c}")
                for c in FEATURE_COLS
            ]
        )

    return docs.select(
        "*", F.inline(quality_views_inline(build, text_col))
    )


def train_quality_classifier(
    reference: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> dict[str, float]:
    """Fit the reference-vs-raw logistic model; returns the plain
    ``{feature: weight, "__intercept__": b}`` dict ``quality_score_col``
    consumes. Positive scores (> 0.5 after sigmoid) mean
    reference-like. Persist it as JSON next to the corpus — the dict
    IS the model.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    pos = _featurized(reference, text_col).select(
        F.lit(1.0).alias("label"), *[f"_f_{c}" for c in FEATURE_COLS]
    )
    neg = _featurized(raw, text_col).select(
        F.lit(0.0).alias("label"), *[f"_f_{c}" for c in FEATURE_COLS]
    )
    train = pos.unionByName(neg)
    assembled = VectorAssembler(
        inputCols=[f"_f_{c}" for c in FEATURE_COLS], outputCol="features"
    ).transform(train)
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    ).fit(assembled)
    weights = {
        c: float(w) for c, w in zip(FEATURE_COLS, model.coefficients)
    }
    weights[INTERCEPT_KEY] = float(model.intercept)
    return weights


def quality_score_col(weights: dict[str, float]) -> Column:
    """Sigmoid(w . features + b) as a pure Column over the PROFILE
    columns — call on a ``text_quality_profile`` frame (or use
    ``classifier_filter`` which composes both). Map-only; weights are
    inlined literals, so nothing ships to executors but the plan."""
    z = F.lit(float(weights.get(INTERCEPT_KEY, 0.0)))
    for c in FEATURE_COLS:
        w = float(weights.get(c, 0.0))
        if w != 0.0:
            z = z + F.lit(w) * _feature_expr(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classifier_filter(
    docs: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    threshold: float = 0.5,
    keep_score: bool = False,
) -> DataFrame:
    """Keep documents the trained classifier scores as reference-like
    (score >= threshold). One map-only pass: profile features and the
    sigmoid evaluate in a single projection; the profile columns are
    dropped from the result (pass ``keep_score`` to retain the
    ``quality_score`` column for sampling or auditing).
    """
    z = F.lit(float(weights.get(INTERCEPT_KEY, 0.0)))
    for c in FEATURE_COLS:
        w = float(weights.get(c, 0.0))
        if w != 0.0:
            z = z + F.lit(w) * F.col(f"_f_{c}")  # _f_* already scaled
    scored = _featurized(docs, text_col).withColumn(
        "quality_score", F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    )
    kept = scored.where(F.col("quality_score") >= threshold)
    out = kept.drop(*[c for c in kept.columns if c.startswith("_f_")])
    return out if keep_score else out.drop("quality_score")


def pareto_draw(seed_col: Column, alpha: float = 9.0) -> Column:
    """The deterministic Pareto(alpha) draw ``pareto_sample_condition``
    compares against: u = md5-uniform in (0, 1) over the seed column,
    pareto = u**(-1/alpha) - 1 — the exact inverse-CDF of numpy's
    Lomax ``pareto(alpha)``. Exposed standalone so verdict-row oracles
    (q60 'clf') can reproduce the draw and band its comparison."""
    u = (
        F.conv(
            F.substring(F.md5(seed_col.cast("string")), 1, 8), 16, 10
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**32 + 2))
    return F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)


def pareto_sample_condition(
    score: Column, alpha: float = 9.0, seed_col: Column | None = None
) -> Column:
    """GPT-3's noisy acceptance rule (Brown et al. 2020, appendix A):
    keep a document iff ``np.random.pareto(alpha) > 1 - score`` —
    implemented DETERMINISTICALLY: the Pareto draw's uniform comes
    from md5 of a per-doc seed column (pass the doc id; defaults to
    the score itself), so retries and partition layout cannot change
    the selection (the engine's no-rand() rule).

    See ``pareto_draw`` for the draw itself. High-scoring docs are
    almost always kept; low-scoring ones survive occasionally,
    preserving the tail diversity the paper wanted.
    """
    if seed_col is None:
        seed_col = score
    return pareto_draw(seed_col, alpha) > (F.lit(1.0) - score)


def quality_score_from_text(
    weights: dict[str, float], text_col: str = "text"
) -> Column:
    """The sigmoid score as a pure Column over RAW TEXT — every
    feature substituted by its functions/text expression, for gates
    that run before any profile projection exists (the curation
    pipelines' quality stage). Same model, same result as
    ``quality_score_col`` on a profile frame.

    FUSED (r10): the weighted features evaluate over ONE bound set of
    shared text views (split/gram/coverage arrays materialize once per
    row, not once per feature); the gram/coverage bind level is
    skipped entirely when no active feature needs it. Zero-weight
    features are skipped exactly as before — bit-identical scores."""
    active = [c for c in FEATURE_COLS if float(weights.get(c, 0.0)) != 0.0]

    from lakeflush_spark.operators.quality import quality_views_inline

    def build(v: dict) -> Column:
        z = F.lit(float(weights.get(INTERCEPT_KEY, 0.0)))
        for c in active:
            z = z + F.lit(float(weights[c])) * _scaled(
                c, _view_feature_exprs(v, c)
            )
        return F.struct(
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("s")
        )

    need_covs = bool(_COV_FEATURES & set(active))
    return F.element_at(
        quality_views_inline(build, text_col, covs=need_covs), 1
    )["s"]
