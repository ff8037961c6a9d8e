"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Published recipe for picking pretraining data that "looks like" a
target domain: featurize every document as a bag of HASHED n-grams
(unigrams + bigrams into ``B`` buckets), fit two bag-of-words models —
one on a small target corpus, one on the raw pool — and resample raw
documents with probability proportional to the importance weight

    w(x) = p_target(x) / p_raw(x)
         = prod over grams g of  p_t(h(g)) / p_r(h(g))

i.e. ``log w = sum_g [log p_t - log p_r]`` with add-alpha smoothing.
Selection is Gumbel-perturbed thresholding (sampling without
replacement in the Gumbel top-k formulation): keep x when
``log w(x) + Gumbel(u_x) > tau``.

Spark-first shapes (100 TB stance):

- Both count tables are BOUNDED by ``buckets`` rows (default 2^16) —
  they broadcast; the corpus-sized gram frame never joins anything
  bigger than itself.
- Scoring is explode -> broadcast-join -> map-side-combinable groupBy
  on the doc id: bodies never shuffle, only (id, h) pairs.
- Selection is pure map-side row-local math on the scored frame; the
  "randomness" is a deterministic md5-derived uniform (no RNG, same
  doc -> same draw on any cluster / any retry).

Cross-engine notes (the q41 'dsir_*' oracle twin): in ``hash_fn="md5"``
mode gram hashing uses the engine-wide md5 bucket trick
(``functions.text.token_hash``) so DuckDB rebuilds identical ids (the
default ``"xxhash64"`` is the faster production path with identical
join/count structure — the ``lm_filter`` split); the integer cores
(gram counts, per-doc matched-count sums) verify exactly. r12: the
scoring chain itself is hash-verifiable — every per-gram ``ln`` term
is snapped to the 1e-6 integer grid (``functions/grid.py``, the q41
'bm25' recipe) so the per-doc log weight is an order-free BIGINT sum
(``log_weight_e6``); rows whose pre-snap value sits within the edge
band of a rounding boundary are *masked* (``lw_edge``), never
compared. The float ``log_weight`` column remains the exact IEEE
chain for ranking/percentile use (``dsir_resample_corpus``) — its
per-doc sum is order-dependent at ~1e-13 and deliberately kept out of
hash contracts; ``dsir_select_e6`` is the deterministic decision path.

Ids must be non-NULL (the draw hashes ``seed || ':' || id``; the
documents contract guarantees a non-NULL BIGINT ``doc_id``).

The reference has no analog (opaque string records end-to-end).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from lakeflush_spark.functions.text import TOKEN_SEP, token_hash, tokens

#: default hashed feature space — the paper's bucketed n-gram space
DSIR_BUCKETS = 1 << 16


def _hashed_grams(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, h) rows: one per unigram and per adjacent bigram, hashed
    into ``[0, buckets)``. Bigrams join tokens with the corpus token
    separator so the hashed string is rebuildable in SQL.

    ``hash_fn``: ``"xxhash64"`` (default) is the fast JVM production
    path — this hash runs once per gram of the whole corpus, the
    single hottest expression in the pipeline; ``"md5"`` uses the
    engine-wide ``conv(substring(md5,1,8),16,10)`` trick so DuckDB
    rebuilds identical bucket ids (the q41 oracle twin) — the same
    split ``operators/lm_filter`` uses."""
    from lakeflush_spark.operators.lm_filter import _tok_hash

    tk = tokens(text_col)
    heads = F.when(F.size(tk) >= 2, F.slice(tk, 1, F.size(tk) - 1)).otherwise(
        F.array().cast("array<string>")
    )
    bigrams = F.transform(
        heads, lambda t, i: F.concat(t, F.lit(TOKEN_SEP), F.get(tk, i + 1))
    )
    grams = F.concat(tk, bigrams)
    return docs.select(
        F.col(id_col).alias("_id"), F.explode(grams).alias("_g")
    ).select("_id", _tok_hash(F.col("_g"), buckets, hash_fn).alias("h"))


def hashed_gram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Hashed-gram count table ``(h, c)`` — the bag-of-words model for
    one corpus. At most ``buckets`` rows regardless of corpus size
    (ONE map-side-combined groupBy), so it broadcasts downstream."""
    return (
        _hashed_grams(docs, id_col, text_col, buckets, hash_fn)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hashed_gram_counts_split(
    docs: DataFrame,
    target_cond: Column,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Both DSIR count tables in ONE corpus pass when the target is a
    labeled SUBSET of the pool (e.g. a source/quality predicate):
    ``(h, c_target, c_raw)`` with conditional counting.

    ``hashed_gram_counts`` over ``where(cond)`` + ``where(~cond)``
    tokenizes/hashes the corpus twice (two scans); here the explode
    carries the boolean and one map-side-combined groupBy produces
    both counts — at 100 TB this halves the count-table build. Derive
    the standard tables with ``.where(c_target > 0)`` /
    ``.where(c_raw > 0)`` — row-identical to the two-pass build (an h
    appears in a table iff some doc on that side produced it). NULL
    semantics match the two-pass build too: rows where ``target_cond``
    evaluates to NULL are excluded from BOTH tables, exactly as
    ``where(cond)`` / ``where(~cond)`` both drop them (r12; previously
    NULL-cond rows silently inflated ``c_raw``). For a target corpus
    that is a SEPARATE frame, use ``hashed_gram_counts`` per frame
    (nothing to fuse).
    """
    flagged = docs.withColumn("__dsir_t", target_cond).where(
        F.col("__dsir_t").isNotNull()
    )
    grams = _hashed_grams(flagged, "__dsir_t", text_col, buckets, hash_fn)
    return grams.groupBy("h").agg(
        F.sum(F.when(F.col("_id"), 1).otherwise(0)).cast("bigint").alias("c_target"),
        F.sum(F.when(F.col("_id"), 0).otherwise(1)).cast("bigint").alias("c_raw"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Attach the DSIR importance weight to every doc in ``docs``.

    Adds ``n_grams`` / ``sum_ct`` / ``sum_cr`` (exact-integer join
    witnesses: gram count and the summed matched counts under each
    model) and ``log_weight``::

        log w = sum_g [ln(ct(g)+a) - ln(cr(g)+a)]
                + n_grams * [ln(Nr + a*B) - ln(Nt + a*B)]

    the add-alpha smoothed log-likelihood ratio (Nt/Nr = total gram
    mass of each model, attached via one-row broadcast aggregates —
    no driver collect). Docs with zero grams get NULLs.

    Two parallel renditions of the same formula come back (r12):

    - ``log_weight`` (DOUBLE) — the exact IEEE chain. Its per-doc sum
      is float-summation-order-dependent (~1e-13 run-to-run); use it
      for ranking and percentile calibration, never in hash contracts.
    - ``log_weight_e6`` (BIGINT) + ``lw_edge`` (BOOLEAN) — every
      per-gram ``ln`` term snapped to the 1e-6 integer grid
      (``functions/grid.py``) and summed as BIGINTs, so the value is
      bit-identical on any engine / partitioning / summation order.
      ``lw_edge`` is true when ANY contributing term (per-gram or the
      normalization lns) sat within the edge band of a rounding
      boundary — such docs must be counted as masked, not compared.

    ``buckets`` and ``hash_fn`` must match the values the count tables
    were built with (hashes must agree).
    """
    from lakeflush_spark.functions.grid import edge_e6, snap_e6

    grams = _hashed_grams(docs, id_col, text_col, buckets, hash_fn)
    a = float(alpha)
    lt = F.log(F.col("_ct") + F.lit(a))
    lr = F.log(F.col("_cr") + F.lit(a))
    joined = (
        grams.join(F.broadcast(target_counts.withColumnRenamed("c", "_ct")), "h", "left")
        .join(F.broadcast(raw_counts.withColumnRenamed("c", "_cr")), "h", "left")
        .select(
            "_id",
            F.coalesce("_ct", F.lit(0)).alias("_ct"),
            F.coalesce("_cr", F.lit(0)).alias("_cr"),
        )
    )
    per_doc = joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("_ct").alias("sum_ct"),
        F.sum("_cr").alias("sum_cr"),
        F.sum(lt).alias("_lt"),
        F.sum(lr).alias("_lr"),
        F.sum(snap_e6(lt)).alias("_lt6"),
        F.sum(snap_e6(lr)).alias("_lr6"),
        F.max(edge_e6(lt).cast("int") + edge_e6(lr).cast("int")).alias("_ge"),
    )
    ab = a * buckets
    lnr = F.log(F.col("_nr") + F.lit(ab))
    lnt = F.log(F.col("_nt") + F.lit(ab))
    nt = target_counts.agg(F.sum("c").alias("_nt"))
    nr = raw_counts.agg(F.sum("c").alias("_nr"))
    scored = (
        per_doc.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "_id",
            "n_grams",
            "sum_ct",
            "sum_cr",
            (
                F.col("_lt")
                - F.col("_lr")
                + F.col("n_grams") * (lnr - lnt)
            ).alias("log_weight"),
            (
                F.col("_lt6")
                - F.col("_lr6")
                + F.col("n_grams") * (snap_e6(lnr) - snap_e6(lnt))
            ).cast("bigint").alias("log_weight_e6"),
            (
                (F.col("_ge") > 0) | edge_e6(lnr) | edge_e6(lnt)
            ).alias("lw_edge"),
        )
    )
    return docs.join(
        scored.withColumnRenamed("_id", id_col), id_col, "left"
    )


def _gumbel_key(id_col: str, weight_col: str, seed: str) -> Column:
    """``log_weight + Gumbel(u)`` with the deterministic md5 uniform
    ``u = (md5_32(seed || ':' || id) + 0.5) / 2^32`` — the perturbed
    key the Gumbel-top-k formulation ranks by. Row-local, no RNG."""
    u = (
        token_hash(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    return F.col(weight_col) - F.log(-F.log(u))


def dsir_select(
    scored: DataFrame,
    threshold: float,
    seed: str = "0",
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    band: float = 1e-9,
) -> DataFrame:
    """Gumbel-perturbed threshold selection — the resampling step.

    Adds ``dsir_key`` = ``log_weight + Gumbel(u)`` where the uniform
    ``u = (md5_32(seed || ':' || id) + 0.5) / 2^32`` is deterministic
    per (seed, id); ``dsir_selected`` = key > threshold; and
    ``dsir_banded`` = |key - threshold| <= band (the q60-style
    decision band: banded rows should be counted separately by
    callers that need cross-engine-stable decision counts). Rows with
    NULL weight get NULL key / false selected. Pure map-side."""
    return (
        scored.withColumn("dsir_key", _gumbel_key(id_col, weight_col, seed))
        .withColumn(
            "dsir_banded",
            F.coalesce(
                F.abs(F.col("dsir_key") - F.lit(float(threshold))) <= F.lit(float(band)),
                F.lit(False),
            ),
        )
        .withColumn(
            "dsir_selected",
            F.coalesce(
                (F.col("dsir_key") > F.lit(float(threshold))) & ~F.col("dsir_banded"),
                F.lit(False),
            ),
        )
    )


def dsir_select_e6(
    scored: DataFrame,
    threshold: float,
    seed: str = "0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hash-deterministic Gumbel-perturbed threshold selection (r12) —
    the integer-grid twin of :func:`dsir_select`, for contracts that
    hash the decision counts across engines.

    Requires the ``log_weight_e6`` / ``lw_edge`` columns that
    :func:`dsir_log_weights` attaches. Adds:

    - ``dsir_key_e6`` (BIGINT) = ``log_weight_e6`` + the snapped
      Gumbel perturbation ``snap_e6(-ln(-ln(u)))`` with the same
      deterministic md5 uniform ``u`` as :func:`dsir_select` — an
      order-free integer, bit-identical on any engine / partitioning.
    - ``dsir_masked`` = ``lw_edge`` OR the Gumbel term's own edge
      flag: some ``ln`` in this row's chain sat within the edge band
      of a 1e-6 rounding boundary, so engines may disagree on the
      snap; masked rows are never selected and must be counted
      separately (q41's 'dsir_mask' label does).
    - ``dsir_selected`` = NOT masked AND ``dsir_key_e6 >
      round(threshold*1e6)`` — an exact BIGINT comparison; no
      decision anywhere depends on float summation order.

    Rows with NULL weight (gram-less docs) get NULL key, false masked,
    false selected. Pure map-side.
    """
    from lakeflush_spark.functions.grid import edge_e6, py_snap_e6, snap_e6

    u = (
        token_hash(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    g = -F.log(-F.log(u))
    tau6 = py_snap_e6(float(threshold))
    return (
        scored.withColumn(
            "dsir_key_e6",
            (F.col("log_weight_e6") + snap_e6(g)).cast("bigint"),
        )
        .withColumn(
            "dsir_masked",
            # Gate on the weight first: a gram-less doc (NULL weight) is
            # never selected regardless of its Gumbel term, so its edge
            # band must not mask it (NULL OR TRUE would otherwise yield
            # TRUE and diverge from oracles that omit gram-less docs).
            F.when(F.col("log_weight_e6").isNull(), F.lit(False)).otherwise(
                F.coalesce(F.col("lw_edge"), F.lit(False)) | edge_e6(g)
            ),
        )
        .withColumn(
            "dsir_selected",
            F.coalesce(
                ~F.col("dsir_masked") & (F.col("dsir_key_e6") > F.lit(tau6)),
                F.lit(False),
            ),
        )
    )


def dsir_resample_corpus(
    docs: DataFrame,
    target_docs: DataFrame,
    keep_frac: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
    seed: str = "0",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One-call DSIR: fit both bag-of-words models, score every doc in
    ``docs``, and keep the top ``keep_frac`` fraction by
    Gumbel-perturbed key — the paper's sampling-without-replacement
    selection, sized by fraction instead of a hand-frozen threshold.

    The threshold is calibrated as the exact ``(1 - keep_frac)``
    percentile of the keys (one aggregation job over the (id, key)
    projection — a single scalar reaches the driver; deterministic,
    unlike ``approx_percentile`` whose sketch merges are order-
    dependent). The scoring chain therefore runs twice (calibration
    pass + selection pass) — both map-side scans; persist ``docs``
    upstream if the input itself is expensive to recompute. Gram-less
    docs (NULL weight) are never selected and do not shift the
    percentile.

    Returns the selected docs with ``log_weight`` / ``dsir_key`` and
    the integer witness columns attached. ``0 < keep_frac <= 1``.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    tc = hashed_gram_counts(target_docs, id_col, text_col, buckets, hash_fn)
    rc = hashed_gram_counts(docs, id_col, text_col, buckets, hash_fn)
    scored = dsir_log_weights(
        docs, tc, rc, id_col, text_col, buckets, alpha, hash_fn
    )
    keyed = scored.withColumn(
        "dsir_key", _gumbel_key(id_col, "log_weight", seed)
    )
    if keep_frac == 1.0:
        return keyed.where(F.col("dsir_key").isNotNull())
    tau = keyed.agg(
        F.expr(f"percentile(dsir_key, {1.0 - float(keep_frac)!r})")
    ).collect()[0][0]
    if tau is None:  # every doc gram-less
        return keyed.where(F.lit(False))
    return keyed.where(F.col("dsir_key") > F.lit(float(tau)))
