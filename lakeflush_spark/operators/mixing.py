"""Training-data mixing: deterministic shuffle, weighted source
sampling, token-budget selection, and multi-epoch materialization
(``plan_epochs`` → ``materialize_epochs`` → ``epoch_shuffle_key``
order — the data-constrained repetition recipe, executable end to
end; ``epoch_shortfall`` reports the gap when the cap binds).

The last mile of an LLM data pipeline (after curation/dedup, before
sequence packing): decide HOW MUCH of each source goes into the run
and in WHAT ORDER. The reference has no analog (it stops at bundle
delivery); these follow the published data-mixture recipes where each
source gets a sampling weight and the global order must be a seeded,
reproducible shuffle.

Everything is content/seed-deterministic via the engine-wide md5
ranking trick (same as q60's stratified sampler and the IVF seed
draw): no RNG state, so retried tasks, re-runs, and different
partitionings all produce the SAME selection and order — the property
that matters for reproducible training runs.

Scale notes: selection is a map-only filter or a SHARDED per-source
prefix sum (see ``sharded_prefix_sum`` — no single task ever sorts a
whole source); the global shuffle is ONE repartition-by-range over the
md5 sort key — exactly the cost of any total order, and writers
usually want ``write.sortBy`` on the same key instead of a driver-side
sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def shuffle_key(id_col: Column | str, seed: str = "0") -> Column:
    """Deterministic pseudo-random sort key: md5(seed || ':' || id).

    Changing ``seed`` produces an independent-looking permutation;
    equal seeds reproduce the order exactly, on any cluster layout.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat_ws(":", F.lit(seed), c.cast("string")))


def deterministic_shuffle(
    df: DataFrame, id_col: str = "doc_id", seed: str = "0"
) -> DataFrame:
    """Globally shuffle rows into a seed-reproducible pseudo-random
    order (one range-partitioned sort on the md5 key — the standard
    pre-training epoch shuffle)."""
    return df.orderBy(shuffle_key(id_col, seed), F.col(id_col))


def sample_fraction(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: str = "0"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (map-only filter).

    The md5 key is uniform on [0, 2**32) over its first 8 hex chars,
    so thresholding it keeps each row independently with probability
    ``fraction`` — but deterministically per (seed, id), unlike
    ``DataFrame.sample`` whose selection depends on partition layout.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bucket = F.conv(F.substring(shuffle_key(id_col, seed), 1, 8), 16, 10).cast("bigint")
    return df.where(bucket < F.lit(int(fraction * (1 << 32))))


def mix_sources(
    df: DataFrame,
    weights: dict[str, float] | Column,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Per-source deterministic downsampling to the given weights.

    ``weights`` maps source value → keep-fraction in [0, 1]; sources
    absent from the map are dropped (explicit beats silent pass-
    through in a training mix). Alternatively pass a ``Column``
    expression evaluating to the keep-fraction per row (NULL = drop) —
    useful when the weight is a FORMULA over the source value (q60's
    index-derived weights): no driver-side distinct/collect is needed
    to enumerate sources. Map-only either way: the fraction filter
    needs no shuffle, so this composes with ``deterministic_shuffle``
    for one total-order pass at the end.
    """
    bucket = F.conv(F.substring(shuffle_key(id_col, seed), 1, 8), 16, 10).cast("bigint")
    if isinstance(weights, Column):
        # same fail-fast contract as the dict path: an out-of-range
        # weight FORMULA (e.g. off-by-one giving 1.3) must raise, not
        # silently keep/drop everything. raise_error evaluates lazily
        # inside the CASE, so valid rows never pay for it.
        checked = F.when(
            weights.isNull() | ((weights >= 0.0) & (weights <= 1.0)), weights
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("mix_sources: weight out of [0, 1]: "),
                    weights.cast("string"),
                )
            )
        )
        thresh = (checked * F.lit(float(1 << 32))).cast("bigint")
        return df.where(thresh.isNotNull() & (bucket < thresh))
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for source {s!r} must be in [0, 1], got {w}")
    keep = F.lit(False)
    src = F.col(source_col)
    for s, w in weights.items():
        keep = keep | ((src == s) & (bucket < F.lit(int(w * (1 << 32)))))
    return df.where(keep)


def hex_order_shard(key_col: Column, shards: int) -> Column:
    """Order-preserving shard id from an md5-hex sort key.

    Folds the first 4 hex chars (uniform on [0, 65536)) into
    ``shards`` buckets with ``floor(prefix * shards / 65536)`` — a
    monotone map, so sorting by (shard, key) equals sorting by key.
    That monotonicity is what lets a sharded prefix sum reproduce the
    unsharded one bit-for-bit.
    """
    if not 1 <= shards <= 65536:
        raise ValueError("shards must be in [1, 65536]")
    prefix = F.conv(F.substring(key_col, 1, 4), 16, 10).cast("bigint")
    return F.floor(prefix * shards / F.lit(65536)).cast("int")


def sharded_prefix_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list,
    value_col: str,
    shard_col: str,
    out_col: str,
    total_col: str | None = None,
) -> DataFrame:
    """Exclusive running sum over (part_cols, ORDER BY order_cols)
    computed WITHOUT putting a whole partition in one task.

    ``df[shard_col]`` must already be an order-preserving bucketing of
    the order key (see ``hex_order_shard``). Two passes:

    1. window over (part_cols, shard) — each task holds one shard of
       one partition key, so max task size is partition/shards;
    2. per-(part, shard) token totals (a tiny map-side-combined agg:
       |parts| × shards rows), turned into cumulative shard offsets by
       a window over the TINY totals frame, broadcast-joined back.

    out = shard_offset + within-shard exclusive sum — identical to the
    naive ``Window.partitionBy(part)`` result because the shard map is
    monotone in the order key. NULL partition keys form their own
    group exactly as the naive window treats them (the offsets join is
    null-safe). This is the 100 TB shape: the naive window is a single
    task per source (~TBs); this is sources × shards bounded tasks
    plus a broadcast of a few-KB frame.

    ``total_col`` (optional) additionally attaches each row's GROUP
    TOTAL (sum of ``value_col`` over its whole part group) — computed
    as one more window over the already-tiny totals frame and carried
    through the same broadcast join, i.e. free: consumers that would
    otherwise run a separate whole-input aggregate for the total
    (``global_ntile``) avoid re-executing the input lineage.
    """
    w_in = (
        Window.partitionBy(*part_cols, shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(value_col).over(w_in), F.lit(0)).cast("bigint")
    totals = df.groupBy(*part_cols, shard_col).agg(
        F.sum(value_col).cast("bigint").alias("_sps_t")
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy(shard_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        *[F.col(c).alias(f"_sps_{c}") for c in [*part_cols, shard_col]],
        F.coalesce(F.sum("_sps_t").over(w_off), F.lit(0)).cast("bigint").alias("_sps_off"),
    ]
    if total_col is not None:
        w_tot = Window.partitionBy(*part_cols).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_sps_t").over(w_tot).cast("bigint").alias("_sps_tot"))
    offsets = totals.select(*off_cols)
    # eqNullSafe join: groupBy keeps NULL keys as a real group (so does
    # Window.partitionBy) — a plain equi-join would silently DROP every
    # NULL-keyed row here, diverging from the naive-window contract
    cond = None
    for c in [*part_cols, shard_col]:
        piece = df[c].eqNullSafe(F.col(f"_sps_{c}"))
        cond = piece if cond is None else cond & piece
    out = (
        df.withColumn("_sps_within", within)
        .join(F.broadcast(offsets), cond)
        .withColumn(out_col, F.col("_sps_off") + F.col("_sps_within"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_sps_tot")).drop("_sps_tot")
    return out.drop(
        "_sps_within", "_sps_off", *[f"_sps_{c}" for c in [*part_cols, shard_col]]
    )


def take_token_budget(
    df: DataFrame,
    budget_per_source: dict[str, int] | Column,
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
    shards: int = 64,
) -> DataFrame:
    """Per-source prefix of a seeded shuffle whose token sum fits the
    budget (the "N billion tokens of source X" selection).

    Docs are ranked per source by the md5 shuffle key; the running
    token sum keeps every doc whose PRECEDING sum is under budget — so
    the budget is exceeded by at most one document, and the selection
    is a prefix: rerunning with a bigger budget is a superset
    (monotone, the property curriculum reruns rely on).

    Scale: the running sum is the two-pass SHARDED prefix sum
    (``sharded_prefix_sum``) — ``Window.partitionBy(source)`` alone
    would sort an entire source in ONE task at 100 TB. The shard id is
    a monotone fold of the md5 key (``hex_order_shard``), so the
    selection is bit-identical to the naive window for any ``shards``;
    ``shards=1`` degenerates to the single-window plan (kept as the
    test reference).

    ``budget_per_source`` is a source → token-budget map, or a
    ``Column`` expression giving the per-row budget (NULL = drop) for
    formula-derived budgets with no driver-side source enumeration.
    """
    if isinstance(budget_per_source, Column):
        limit = budget_per_source
    else:
        budget = F.create_map(
            *[x for s, b in budget_per_source.items() for x in (F.lit(s), F.lit(b))]
        )
        limit = F.element_at(budget, F.col(source_col))
    if shards <= 1:
        w = (
            Window.partitionBy(source_col)
            .orderBy(shuffle_key(id_col, seed), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        running = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("bigint"))
        return (
            df.withColumn("_preceding_tokens", running)
            .where(limit.isNotNull() & (F.col("_preceding_tokens") < limit))
            .drop("_preceding_tokens")
        )
    keyed = df.withColumn("_tb_k", shuffle_key(id_col, seed)).withColumn(
        "_tb_shard", hex_order_shard(F.col("_tb_k"), shards)
    )
    summed = sharded_prefix_sum(
        keyed,
        part_cols=[source_col],
        order_cols=[F.col("_tb_k"), F.col(id_col)],
        value_col=token_col,
        shard_col="_tb_shard",
        out_col="_preceding_tokens",
    )
    return summed.where(
        limit.isNotNull() & (F.col("_preceding_tokens") < limit)
    ).select(*df.columns)


def temperature_weights(
    counts: DataFrame,
    count_col: str,
    key_col: str = "source",
    alpha: float = 0.5,
    scale: int = 10_000,
) -> DataFrame:
    """Temperature-resampled mixing weights: w_k ∝ count_k**alpha.

    The published low-resource up-sampling recipe (mT5/UniMax
    "temperature sampling"): alpha=1 reproduces natural proportions,
    alpha→0 approaches uniform, alpha=0.5 is the common middle ground.
    Returns one row per key: (key_col, weight, share_x{scale}) where
    ``weight = floor(scale * count**alpha)`` (BIGINT) and
    ``share_x{scale}`` is the integer-rounded normalized share
    ``round_half_up(scale * weight / Σ weight)``.

    Exactness: for alpha=0.5 the power is ``sqrt`` — correctly rounded
    under IEEE-754 in every engine — so weight and share are
    bit-identical cross-engine (the q60 'temp' oracle relies on this).
    Other alphas go through ``pow``, which libms round differently in
    the last ulp; results are then deterministic per engine but not
    oracle-exact.

    Scale stance: ``counts`` is the already-aggregated per-source
    frame (|sources| rows) — it is coalesced to ONE partition first,
    so the Σ-weight combine needs no SinglePartition exchange (a
    1-partition child already satisfies AllTuples) and the share join
    is a 1-row broadcast. Nothing corpus-sized moves; do NOT pass a
    per-document frame.

    Fail-fast contract: a zero weight SUM (all-zero counts, or counts
    small enough that every floor(scale*count**alpha) is 0) raises at
    evaluation instead of silently emitting NULL shares, and so does a
    share numerator that would break the half-up division's exactness
    precondition (2*scale*weight + Σweight must stay < 2**53 — see
    ``_round_half_up_int``); callers with astronomically large
    ``scale`` get an error, not a last-ulp-wrong share.
    """
    c = F.col(count_col).cast("double")
    p = F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(float(alpha)))
    w = counts.coalesce(1).select(
        F.col(key_col),
        F.floor(F.lit(float(scale)) * p).cast("bigint").alias("weight"),
    )
    tot = w.select(F.sum("weight").alias("_tot"))
    num = F.lit(scale) * F.col("weight")
    share = (
        F.when(
            F.col("_tot") <= 0,
            F.raise_error(
                F.lit(
                    "temperature_weights: weight sum is 0 — every "
                    f"floor({scale} * count**{alpha}) vanished; raise "
                    "`scale` or check the counts frame"
                )
            ).cast("bigint"),
        )
        .when(
            # guard arithmetic in DOUBLE: the exact BIGINT form would
            # itself overflow (ANSI error) before the check could fire
            F.lit(2.0) * F.lit(float(scale)) * F.col("weight").cast("double")
            + F.col("_tot").cast("double")
            >= F.lit(float(2**53)),
            F.raise_error(
                F.lit(
                    "temperature_weights: 2*scale*weight + sum(weight) "
                    ">= 2**53 — the half-up share division is no longer "
                    "exact; lower `scale`"
                )
            ).cast("bigint"),
        )
        .otherwise(_round_half_up_int(num, F.col("_tot")))
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(key_col, "weight", share.alias(f"share_x{scale}"))
    )


def _round_half_up_int(num: Column, den: Column) -> Column:
    """round-half-up(num/den) for positive BIGINTs, exactly (the
    functions/text.py trick: floor((2*num + den) / (2*den)))."""
    return F.floor((F.lit(2) * num + den) / (F.lit(2) * den)).cast("bigint")


def plan_epochs(
    card: DataFrame,
    target_tokens: int,
    max_epochs: float = 4.0,
    tokens_col: str = "n_tokens",
    key_col: str = "source",
) -> DataFrame:
    """Per-source epoch plan for a token target under a repetition cap
    — the data-constrained scaling recipe (Muennighoff et al. 2023:
    repeating data beyond ~4 epochs returns rapidly diminishing
    value): scale every source by the same factor
    ``min(max_epochs, target / total_tokens)``, so the mix PROPORTIONS
    are preserved and no source repeats beyond the cap.

    Input is a data-card-shaped frame (``corpus_report`` output or any
    (key, token-count) frame — |sources| rows, driver-scale). Returns
    one row per key: (key, available tokens, ``epochs`` double,
    ``planned_tokens`` bigint = floor(epochs * available)), plus the
    achieved total is just sum(planned_tokens) — short of the target
    exactly when the cap binds (the signal to go find more data, which
    is the point of the cap; ``epoch_shortfall`` turns that into the
    per-source report). Arithmetic on a tiny frame; the EXECUTION step
    is ``materialize_epochs(df, plan)``, which emits floor(epochs)
    full passes plus a fractional-epoch budget prefix per source.
    (``take_token_budget`` alone CANNOT realize a plan with epochs > 1
    — a one-pass prefix caps out at one epoch of each source.)
    """
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    total = card.agg(
        F.sum(F.col(tokens_col)).cast("double").alias("_t")
    ).first()["_t"]
    if not total:
        raise ValueError("card has no tokens")
    factor = min(float(max_epochs), float(target_tokens) / total)
    return card.select(
        F.col(key_col).alias("key"),
        F.col(tokens_col).cast("bigint").alias("available_tokens"),
        F.lit(factor).alias("epochs"),
        F.floor(F.lit(factor) * F.col(tokens_col).cast("double"))
        .cast("bigint")
        .alias("planned_tokens"),
    )


def epoch_shortfall(plan: DataFrame, target_tokens: int) -> DataFrame:
    """Per-source shortfall view over a ``plan_epochs`` plan — the
    go-find-more-data report a data card ships when the repetition cap
    binds.

    ``desired_tokens`` = floor((target / Σ available) * available) —
    each source's UNCAPPED proportional ask (the same two-step float
    arithmetic as ``plan_epochs``: divide first, then scale, so the
    numbers are bit-identical to an oracle replay);
    ``shortfall_tokens`` = desired − planned, positive exactly when
    the cap binds. All on the |sources|-row plan frame — coalesced to
    ONE partition first (the temperature_weights trick: a 1-partition
    child already satisfies the total agg's AllTuples, so no
    SinglePartition exchange), then one 1-row broadcast total;
    nothing corpus-sized moves.
    """
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    plan = plan.coalesce(1)
    tot = plan.agg(
        F.sum("available_tokens").cast("double").alias("_tot")
    )
    desired = F.floor(
        (F.lit(float(target_tokens)) / F.col("_tot"))
        * F.col("available_tokens").cast("double")
    ).cast("bigint")
    return plan.crossJoin(F.broadcast(tot)).select(
        "key",
        "available_tokens",
        "epochs",
        "planned_tokens",
        desired.alias("desired_tokens"),
        (desired - F.col("planned_tokens")).alias("shortfall_tokens"),
    )


def epoch_shuffle_key(
    epoch_col: Column | str, id_col: Column | str, seed: str = "0"
) -> Column:
    """Deterministic per-epoch shuffle key:
    md5(len(seed):seed:epoch:tagged_id).

    Each epoch of a materialized multi-epoch selection gets an
    INDEPENDENT-looking permutation (the epoch number salts the key),
    so repeated data never replays in the same order — the property
    data-constrained training runs rely on. Order the output of
    ``materialize_epochs`` by this key for the global shuffle.

    The encoding is UNAMBIGUOUS for every (seed, epoch, id) triple —
    a plain ``concat_ws(':')`` would skip NULL ids and let a ':' in
    the seed or id alias distinct triples onto one key, quietly
    correlating permutations that must be independent. Here the seed
    is length-prefixed (so a ':' inside it can't shift the epoch
    boundary), the epoch is digits-only and ':'-terminated, and the
    id is tagged 'n' (NULL) or 'v'+value, so NULL, '' and ':'-bearing
    ids all hash apart. ``epoch_col`` itself must be non-NULL (it is
    generated by ``materialize_epochs``, never NULL there).
    """
    e = F.col(epoch_col) if isinstance(epoch_col, str) else epoch_col
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    cs = c.cast("string")
    return F.md5(
        F.concat(
            F.lit(f"{len(seed)}:{seed}:"),
            e.cast("string"),
            F.lit(":"),
            F.when(cs.isNull(), F.lit("n")).otherwise(
                F.concat(F.lit("v"), cs)
            ),
        )
    )


def materialize_epochs(
    df: DataFrame,
    plan: DataFrame,
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
    shards: int = 64,
    epoch_col: str = "epoch",
    strict: bool = False,
) -> DataFrame:
    """EXECUTE a ``plan_epochs`` plan: emit, per source with planned
    epochs e, ⌊e⌋ full copies of every document plus a fractional
    final epoch selected as a seeded-shuffle token-budget prefix — so
    the delivered token count equals ``planned_tokens`` within one
    document per source (the prefix overshoots by at most one doc).

    Join semantics are INNER on source==plan.key: input rows whose
    source has no plan row are dropped (a plan IS the keep-list), and
    a plan key absent from ``df`` delivers nothing for that source.
    Pass ``strict=True`` to instead RAISE when the two key sets
    differ — two anti-join counts against the tiny plan frame (one
    distinct-scan of ``df``'s source column), so mismatches surface
    as an error instead of silent under-delivery.

    Output = ``df``'s columns plus ``epoch_col`` (0-based BIGINT).
    Every copy carries its epoch number; order downstream by
    ``epoch_shuffle_key(epoch_col, id_col, seed)`` — each epoch is a
    DIFFERENTLY-ordered full pass (md5(seed:epoch:id) salts the
    permutation per epoch), not a replay of one order.

    Determinism: content/seed-addressed like everything in this module
    — no RNG, so retries, re-runs and partition layout reproduce the
    selection exactly; a bigger plan for the same seed is a superset
    (full epochs only grow, and the fractional prefix is monotone in
    its budget).

    Scale stance: the plan joins in as a |sources|-row BROADCAST; full
    epochs are a map-only explode-by-⌊e⌋ (≤ ``max_epochs``-way row
    multiplication — inherent to materialization, no shuffle); ONLY
    the fractional-epoch rows take the two-pass sharded prefix sum
    (``sharded_prefix_sum`` — never a whole source in one task).
    ``shards=1`` degenerates to the single-window reference plan.
    """
    if epoch_col in df.columns:
        raise ValueError(
            f"materialize_epochs: input already has a {epoch_col!r} column"
        )
    p = plan.select(
        F.col("key").alias("_me_key"),
        F.col("available_tokens").cast("bigint").alias("_me_avail"),
        F.col("epochs").cast("double").alias("_me_epochs"),
        F.col("planned_tokens").cast("bigint").alias("_me_planned"),
    )
    if strict:
        src = df.select(
            F.col(source_col).alias("_me_src")
        ).distinct()  # map-side-combined agg on |sources| keys
        unplanned = [
            r._me_src
            for r in src.join(
                p, F.col("_me_src").eqNullSafe(F.col("_me_key")), "left_anti"
            ).collect()
        ]
        undelivered = [
            r._me_key
            for r in p.join(
                src, F.col("_me_key").eqNullSafe(F.col("_me_src")), "left_anti"
            ).collect()
        ]
        if unplanned or undelivered:
            raise ValueError(
                "materialize_epochs(strict=True): plan/input source "
                f"mismatch — sources with no plan row: {sorted(unplanned, key=str)!r}; "
                f"plan keys absent from input: {sorted(undelivered, key=str)!r}"
            )
    # eqNullSafe: a NULL source key is a real group in the plan
    joined = df.join(
        F.broadcast(p), F.col(source_col).eqNullSafe(F.col("_me_key"))
    )
    full = F.floor(F.col("_me_epochs")).cast("bigint")
    frac_budget = F.col("_me_planned") - full * F.col("_me_avail")
    n_copies = full + F.when(frac_budget > 0, F.lit(1)).otherwise(F.lit(0)).cast(
        "bigint"
    )
    # sequence(0, -1) would count DOWN — gate zero-copy rows out first
    exploded = joined.where(n_copies > 0).withColumn(
        epoch_col,
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_copies - 1)),
    )
    keep_cols = [*df.columns, epoch_col]
    keepers = exploded.where(F.col(epoch_col) < full).select(*keep_cols)
    frac = exploded.where((F.col(epoch_col) == full) & (frac_budget > 0))
    key = epoch_shuffle_key(epoch_col, id_col, seed)
    if shards <= 1:
        w = (
            Window.partitionBy(source_col)
            .orderBy(key, F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prec = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("bigint"))
        frac_kept = frac.withColumn("_me_prec", prec)
    else:
        keyed = frac.withColumn("_me_k", key).withColumn(
            "_me_shard", hex_order_shard(F.col("_me_k"), shards)
        )
        frac_kept = sharded_prefix_sum(
            keyed,
            part_cols=[source_col],
            order_cols=[F.col("_me_k"), F.col(id_col)],
            value_col=token_col,
            shard_col="_me_shard",
            out_col="_me_prec",
        )
    frac_kept = frac_kept.where(
        F.col("_me_prec")
        < F.col("_me_planned")
        - F.floor(F.col("_me_epochs")).cast("bigint") * F.col("_me_avail")
    ).select(*keep_cols)
    return keepers.unionByName(frac_kept)


def select_training_mix(
    df: DataFrame,
    target_tokens: int,
    max_epochs: float = 4.0,
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
    shards: int = 64,
    epoch_col: str = "epoch",
    strategy: str = "proportional",
) -> tuple[DataFrame, DataFrame]:
    """One-call data-constrained mix selection: build the per-source
    card from ``df`` itself, plan epochs under the repetition cap, and
    materialize the selection — returns ``(selected, plan)`` where
    ``selected`` carries ``df``'s columns plus ``epoch_col`` (order it
    by ``epoch_shuffle_key(epoch_col, id_col, seed)`` for the global
    shuffle) and ``plan`` is the ``plan_epochs``-shaped frame (feed it
    to ``epoch_shortfall`` for the go-find-more-data report).

    ``strategy`` picks the allocator: ``'proportional'`` scales every
    source by the same factor under the cap (``plan_epochs``);
    ``'unimax'`` distributes the budget as uniformly as the caps allow
    (``unimax_allocations`` — Chung et al. 2023), the fairer choice
    when low-resource sources must not be starved. UniMax's greedy is
    integer-exact, so its ``max_epochs`` must be a whole number.

    Composition sugar over ``plan_epochs``/``unimax_allocations`` →
    ``materialize_epochs`` — same determinism and scale shape (the
    card aggregation is the only extra cost: one map-side-combined
    groupBy of |sources| rows).
    """
    card = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_col).cast("bigint").alias("n_tokens")
    )
    if strategy == "proportional":
        plan = plan_epochs(card, target_tokens, max_epochs=max_epochs)
    elif strategy == "unimax":
        if max_epochs != int(max_epochs):
            raise ValueError(
                "select_training_mix(strategy='unimax'): max_epochs must "
                f"be a whole number (integer-exact greedy), got {max_epochs}"
            )
        plan = unimax_allocations(card, target_tokens, int(max_epochs))
    else:
        raise ValueError(
            "select_training_mix: strategy must be 'proportional' or "
            f"'unimax', got {strategy!r}"
        )
    selected = materialize_epochs(
        df,
        plan,
        token_col=token_col,
        source_col=source_col,
        id_col=id_col,
        seed=seed,
        shards=shards,
        epoch_col=epoch_col,
    )
    return selected, plan


def unimax_allocations(
    card: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    tokens_col: str = "n_tokens",
    key_col: str = "source",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023): distribute a
    token budget as UNIFORMLY as possible across sources subject to a
    per-source repetition cap — the fairer alternative to
    ``plan_epochs``' proportional scaling when low-resource sources
    should not be starved.

    The published greedy, in EXACT integer arithmetic (every division
    is an integer floor, so the DuckDB oracle's recursive-CTE replay
    is bit-identical): visit sources in ascending (available, key)
    order; at each step the tentative fair share is
    ``u = floor(remaining_budget / remaining_sources)``. A source
    whose cap ``max_epochs * available`` is <= u takes its whole cap
    (it cannot absorb a fair share); the first source whose cap
    exceeds u stops the walk, and the remaining budget splits equally
    over ALL remaining sources — ``u`` each plus one extra token to
    the first ``remaining_budget % remaining`` of them (deterministic
    remainder order = the walk order).

    Properties: Σ allocation = min(budget, max_epochs × Σ available)
    exactly; no source exceeds its cap; all uncapped sources receive
    within one token of each other.

    Returns the ``plan_epochs`` shape — (key, available_tokens,
    ``epochs`` double = allocation/available, ``planned_tokens`` =
    allocation) — so ``materialize_epochs`` executes it directly.

    Scale stance: the card is a |sources|-row driver-scale frame (same
    contract as ``plan_epochs``); the greedy is a sequential walk, so
    it runs driver-side on the collected card — nothing corpus-sized
    moves.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if max_epochs < 1 or int(max_epochs) != max_epochs:
        raise ValueError(
            "max_epochs must be a positive INTEGER — the cap enters the "
            "exact integer arithmetic (use plan_epochs for fractional caps)"
        )
    max_epochs = int(max_epochs)
    rows = sorted(
        (
            (r[key_col], int(r[tokens_col]))
            for r in card.select(key_col, tokens_col).collect()
        ),
        key=lambda kv: (kv[1], kv[0]),
    )
    if not rows:
        raise ValueError("card is empty")
    n = len(rows)
    rem = int(budget_tokens)
    alloc: dict = {}
    for i, (key, avail) in enumerate(rows):
        r = n - i
        u = rem // r
        cap = max_epochs * avail
        if cap <= u:
            alloc[key] = cap
            rem -= cap
        else:
            extra = rem % r
            for j, (key2, _) in enumerate(rows[i:]):
                alloc[key2] = u + (1 if j < extra else 0)
            break
    spark = card.sparkSession
    from lakeflush_spark.io import local_rows_df

    # one-slice local frame (io.local_rows_df): the plan is
    # |sources|-row driver data; downstream coalesce(1)/broadcast
    # consumers must not pay a 32-slice python-worker walk
    return local_rows_df(
        spark,
        [
            (key, avail, (alloc[key] / avail) if avail else 0.0, alloc[key])
            for key, avail in rows
        ],
        "key string, available_tokens long, epochs double, planned_tokens long",
    )


def _token_capped_shards(
    keyed: DataFrame, id_col: str, token_col: str, cap: int
) -> DataFrame:
    """Greedy token-capped shard assignment over the ``_tsk``-ordered
    corpus (see write_training_shards' token-capped mode). The fold is
    sequential per ``_tss`` segment: an Arrow-batched applyInPandas
    over the slim (id, tokens, key) projection walks the segment in
    key order and starts a new local shard whenever the next doc would
    exceed ``cap``; tiny per-segment shard counts become broadcast
    cumulative offsets. Bodies never enter Python — the assignment
    joins back on the id."""
    id_type = keyed.schema[id_col].dataType.simpleString()
    seg_type = keyed.schema["_tss"].dataType.simpleString()

    def fill(pdf):
        pdf = pdf.sort_values(["_tsk", "_tc_id"], kind="mergesort")
        shards: list[int] = []
        cur, lvl = 0, 0
        for t in pdf["_tc_t"]:
            t = int(t)
            if lvl + t > cap and lvl > 0:
                cur += 1
                lvl = 0
            shards.append(cur)
            lvl += t
        return pdf.assign(_tc_local=shards)[
            ["_tc_id", "_tss", "_tc_local", "_tc_t"]
        ]

    slim = keyed.select(
        F.col(id_col).alias("_tc_id"),
        F.col(token_col).cast("bigint").alias("_tc_t"),
        "_tsk",
        "_tss",
    )
    assign = (
        slim.groupBy("_tss")
        .applyInPandas(
            fill,
            schema=(
                f"_tc_id {id_type}, _tss {seg_type}, _tc_local bigint, "
                "_tc_t bigint"
            ),
        )
        .localCheckpoint()  # feeds the max check, counts agg, and id join
    )
    # oversized-doc validation rides the already-materialized
    # assignment (no dedicated corpus scan — r14 review): greedy fill
    # placed such a doc alone in an over-cap shard, so refuse BEFORE
    # anything writes
    mx = assign.agg(F.max("_tc_t").alias("m")).first()["m"]
    if mx is not None and int(mx) > cap:
        raise ValueError(
            f"tokens_per_shard={cap} is smaller than the largest "
            f"document ({int(mx)} tokens) — an unsplittable doc can "
            "never be placed; raise the cap or split upstream"
        )
    # |order_shards|-row frame: the single-task window is over ~64 rows
    counts = assign.groupBy("_tss").agg(
        (F.max("_tc_local") + 1).cast("bigint").alias("_tc_n")
    )
    w_off = Window.orderBy("_tss").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_tss",
        F.coalesce(F.sum("_tc_n").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("_tc_off"),
    )
    shard_map = assign.join(F.broadcast(offsets), "_tss").select(
        "_tc_id",
        (F.col("_tc_off") + F.col("_tc_local")).cast("bigint").alias("shard"),
    )
    return keyed.drop("_tss").join(
        shard_map, F.col(id_col) == F.col("_tc_id")
    ).drop("_tc_id")


def write_training_shards(
    df: DataFrame,
    dest_dir: str,
    *,
    rows_per_shard: int | None = None,
    tokens_per_shard: int | None = None,
    seed: str = "0",
    id_col: str = "doc_id",
    token_col: str | None = None,
    order_shards: int = 64,
) -> DataFrame:
    """Final-mile training export (r13): write ``df`` as
    deterministically shuffled, FIXED-SIZE parquet shards plus a
    manifest — the step that turns a curated corpus into the artifact
    a trainer's dataloader consumes.

    - Rows order by the seed-reproducible md5 shuffle key
      (:func:`shuffle_key`), ranked with the sharded
      ``global_row_number`` (hex_order_shard buckets + broadcast
      offsets — NO Exchange SinglePartition, no single-task sort);
      shard id = ``(rank - 1) // rows_per_shard``, so every shard
      except the last holds exactly ``rows_per_shard`` rows for any
      cluster layout.
    - Shards land as ``shard=N/`` parquet partitions, one file per
      shard (rows sorted by the shuffle key within the file), written
      ``mode=error`` — an export is immutable; re-export to a fresh
      dir.
    - The manifest (returned AND written under ``{dest}/_manifest/``,
      which plain ``spark.read.parquet(dest)`` ignores) carries per
      shard: ``rows``, ``id_checksum`` (order-free BIGINT sum of
      md5-derived id hashes — cross-engine verifiable), and
      ``n_tokens`` when ``token_col`` is given (dataloader budget
      accounting).

    **Token-capped mode (r14, VERDICT r13 #6)**: pass
    ``tokens_per_shard`` (with ``token_col``) INSTEAD of
    ``rows_per_shard`` — trainers budget shards by tokens, not rows.
    Shard membership is a greedy in-order fill with a STRICT cap:
    walking the same global md5-shuffle order, a document goes into
    the current shard unless it would push the shard over
    ``tokens_per_shard``, in which case it starts the next shard — so
    every shard's token sum is ≤ the cap (every doc must itself be ≤
    the cap; validated up front). Scale shape: the greedy fold is
    inherently sequential, so it runs per ``order_shards`` segment
    (Arrow-batched ``applyInPandas`` over a SLIM (id, tokens, key)
    projection — bodies stay JVM-side), each segment starting a fresh
    shard; global shard ids are segment-local ids plus broadcast
    cumulative segment shard counts. That adds at most one underfull
    shard per segment versus the true sequential fill and bounds every
    task at corpus/order_shards rows. Concatenating shards in id order
    yields exactly the row-capped export's document order — the two
    modes differ only in where the shard boundaries fall. Sizing note
    for the token mode: one segment's SLIM rows (~25 B each) must fit
    a Python worker's memory in one pandas frame (pandas cannot spill
    the way the row-capped mode's JVM window sort can) — raise
    ``order_shards`` (up to 65536) until corpus_rows/order_shards is
    tens of millions at most.

    Determinism contract: same (df contents, seed, rows_per_shard |
    tokens_per_shard) → byte-identical shard membership and manifest,
    independent of partitioning — the property that makes a training
    run resumable and auditable. ``order_shards`` bounds the largest
    sort task (corpus/order_shards rows), not correctness.

    ``id_col`` values must be unique (the standard curated-corpus
    contract; exact dedup is an upstream stage): the manifest's
    order-free id checksum assumes it, and the token-capped mode's
    assignment join would duplicate rows under repeated ids.
    """
    if (rows_per_shard is None) == (tokens_per_shard is None):
        raise ValueError(
            "exactly one of rows_per_shard / tokens_per_shard is required"
        )
    if rows_per_shard is not None and rows_per_shard < 1:
        raise ValueError("rows_per_shard must be >= 1")
    if tokens_per_shard is not None:
        if tokens_per_shard < 1:
            raise ValueError("tokens_per_shard must be >= 1")
        if token_col is None:
            raise ValueError("tokens_per_shard requires token_col")
    from lakeflush_spark.functions.text import token_hash
    from lakeflush_spark.operators.topk import global_row_number

    base = dest_dir.rstrip("/")
    key = shuffle_key(id_col, seed)
    keyed = df.withColumn("_tsk", key).withColumn(
        "_tss", hex_order_shard(F.col("_tsk"), order_shards)
    )
    if rows_per_shard is not None:
        ranked = global_row_number(
            keyed, order_cols=[F.col("_tsk"), F.col(id_col)], shard_col="_tss"
        ).withColumn(
            "shard",
            F.floor((F.col("rn") - 1) / F.lit(int(rows_per_shard))).cast("bigint"),
        )
        out = ranked.drop("_tss")
    else:
        out = _token_capped_shards(
            keyed, id_col, token_col, int(tokens_per_shard)
        )
    (
        out.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "_tsk", id_col)
        .drop("_tsk", "rn")
        .write.mode("error")
        .partitionBy("shard")
        .parquet(base)
    )
    agg = [
        F.count(F.lit(1)).cast("bigint").alias("rows"),
        F.sum(token_hash(F.col(id_col).cast("string")))
        .cast("bigint")
        .alias("id_checksum"),
    ]
    if token_col is not None:
        agg.append(F.sum(token_col).cast("bigint").alias("n_tokens"))
    manifest = (
        # derived from the WRITTEN files, so the manifest certifies the
        # artifact on disk, not the plan that produced it
        out.sparkSession.read.option("basePath", base)
        .parquet(base)
        .groupBy("shard")
        .agg(*agg)
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("error").parquet(f"{base}/_manifest")
    return out.sparkSession.read.parquet(f"{base}/_manifest").orderBy("shard")


def verify_training_shards(
    spark,
    dest_dir: str,
    *,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Integrity audit of a :func:`write_training_shards` export (r14):
    re-scan the written shards, recompute per-shard rows, the
    order-free id checksum, and (when ``token_col`` is given) the
    token sum, and compare each against the ``_manifest`` sidecar.

    Returns one row per shard: the recomputed and manifest values plus
    an ``ok`` verdict — run it before handing a dataloader the export
    (bit-rot, partial copies, and hand-edited shards all surface as a
    false ``ok``). A shard present on disk but missing from the
    manifest (or vice versa) yields a row with NULLs on the absent
    side and ``ok = false`` (``eqNullSafe``, so ``ok`` is never NULL).
    The pass condition is EVERY row true:
    ``result.where(~F.col("ok")).count() == 0``.

    Cost: ONE scan of the export with a map-side-combined groupBy on
    the shard partition column, then a |shards|-row full-outer join
    against the manifest (full-outer cannot broadcast, so this is a
    sort-merge over the two tiny per-shard aggregates — negligible);
    no driver-side rows beyond the |shards| result.
    """
    from lakeflush_spark.functions.text import token_hash

    base = dest_dir.rstrip("/")
    agg = [
        F.count(F.lit(1)).cast("bigint").alias("rows_actual"),
        F.sum(token_hash(F.col(id_col).cast("string")))
        .cast("bigint")
        .alias("ck_actual"),
    ]
    if token_col is not None:
        agg.append(F.sum(token_col).cast("bigint").alias("tokens_actual"))
    actual = (
        spark.read.option("basePath", base)
        .parquet(base)
        .groupBy("shard")
        .agg(*agg)
    )
    manifest = spark.read.parquet(f"{base}/_manifest")
    joined = actual.join(manifest, "shard", "full_outer")
    ok = (
        F.col("rows_actual").eqNullSafe(F.col("rows"))
        & F.col("ck_actual").eqNullSafe(F.col("id_checksum"))
    )
    if token_col is not None and "n_tokens" in manifest.columns:
        ok = ok & F.col("tokens_actual").eqNullSafe(F.col("n_tokens"))
    return joined.withColumn("ok", ok).orderBy("shard")
