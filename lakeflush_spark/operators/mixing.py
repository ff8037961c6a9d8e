"""Training-data mixing: deterministic shuffle, weighted source
sampling, token-budget selection.

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

Scale notes: selection is a map-only filter or a per-source window
rank over md5 keys (one shuffle per source partition, same shape as
any groupBy); the global shuffle is ONE repartition-by-range over the
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
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Per-source deterministic downsampling to the given weights.

    ``weights`` maps source value → keep-fraction in [0, 1]; sources
    absent from the map are dropped (explicit beats silent pass-
    through in a training mix). Map-only: the fraction filter needs no
    shuffle, so this composes with ``deterministic_shuffle`` for one
    total-order pass at the end.
    """
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for source {s!r} must be in [0, 1], got {w}")
    bucket = F.conv(F.substring(shuffle_key(id_col, seed), 1, 8), 16, 10).cast("bigint")
    keep = F.lit(False)
    src = F.col(source_col)
    for s, w in weights.items():
        keep = keep | ((src == s) & (bucket < F.lit(int(w * (1 << 32)))))
    return df.where(keep)


def take_token_budget(
    df: DataFrame,
    budget_per_source: dict[str, int],
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Per-source prefix of a seeded shuffle whose token sum fits the
    budget (the "N billion tokens of source X" selection).

    Docs are ranked per source by the md5 shuffle key; the running
    token sum (window, one shuffle per the groupBy shape) keeps every
    doc whose PRECEDING sum is under budget — so the budget is
    exceeded by at most one document, and the selection is a prefix:
    rerunning with a bigger budget is a superset (monotone, the
    property curriculum reruns rely on).
    """
    w = (
        Window.partitionBy(source_col)
        .orderBy(shuffle_key(id_col, seed), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("bigint"))
    budget = F.create_map(
        *[x for s, b in budget_per_source.items() for x in (F.lit(s), F.lit(b))]
    )
    limit = F.element_at(budget, F.col(source_col))
    return (
        df.withColumn("_preceding_tokens", running)
        .where(limit.isNotNull() & (F.col("_preceding_tokens") < limit))
        .drop("_preceding_tokens")
    )
