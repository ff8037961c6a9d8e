"""Exact grouped top-k and global row numbering without single-task sorts.

``row_number() OVER (PARTITION BY group ORDER BY ...)`` puts every row
of a group in ONE window task — for low-cardinality groups (25
nations, a handful of ANN queries) that is a whole-corpus sort on one
core at 100 TB. The standard two-phase rewrite is exact for any k:

1. salt each group into ``shards`` disjoint subsets (hash of the
   tie-break id — deterministic, layout-independent) and take the
   local top-k of every (group, shard): any row ranked ≤ k in the
   full group is ranked ≤ k within whichever subset contains it, so
   no global winner is lost;
2. re-rank the surviving ≤ groups × shards × k rows (tiny) with the
   plain per-group window.

Same decomposition trick as ``operators/mixing.sharded_prefix_sum``
(shard, solve locally, combine cheap global state); here the global
combine is itself a window but over a provably tiny frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def grouped_top_k(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_cols: list[str],
    rank_col: str = "rank",
    shards: int = 32,
) -> DataFrame:
    """Per-group top-k with ``rank_col`` (1-based, bigint) attached.

    ``order_cols`` must define a TOTAL order within each group (include
    a unique tie-break column — the same requirement a deterministic
    row_number has); ``salt_cols`` are hashed into the shard id, and
    should be that tie-break id so shards are deterministic and
    well-balanced. Output rows/values are identical to the naive
    single-window form for any ``shards``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(shards))
    local_w = Window.partitionBy(*group_cols, "_tk_salt").orderBy(*order_cols)
    cand = (
        df.withColumn("_tk_salt", salt)
        .withColumn("_tk_lr", F.row_number().over(local_w))
        .where(F.col("_tk_lr") <= k)
        .drop("_tk_lr")
    )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        cand.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .where(F.col(rank_col) <= k)
        .drop("_tk_salt")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list,
    shard_col: str,
    out_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY order_cols)`` without the
    single-task total sort.

    The naive global window is ``Exchange SinglePartition`` + one task
    sorting the entire input — the worst driver-funnel shape at 100 TB.
    This is the prefix-count special case of
    ``operators/mixing.sharded_prefix_sum`` (each row's rank = 1 +
    count of preceding rows): rank within (shard), then add broadcast
    cumulative shard counts. Exact and deterministic for any shard
    count, PROVIDED:

    - ``order_cols`` is a TOTAL order (include a unique tie-break);
    - ``df[shard_col]`` is an order-preserving bucketing: monotone
      non-decreasing in the leading order column(s), e.g. a width
      bucket over the leading key's bounds (q42/q58 pattern) or
      ``mixing.hex_order_shard`` over an md5 sort key. A monotone map
      can only cut between order-distinct rows, so shard-local ranks +
      shard offsets reproduce the global ranks bit-for-bit.

    Max task size is the largest shard, not the whole input; shard
    balance is the caller's shard function's job. ``total_col``
    additionally attaches the TOTAL row count to every row — it rides
    the prefix-sum machinery's tiny shard-totals frame for free
    (no separate whole-input count pass; see :func:`global_ntile`).
    """
    from lakeflush_spark.operators.mixing import sharded_prefix_sum

    out = sharded_prefix_sum(
        df.withColumn("_grn_one", F.lit(1)),
        part_cols=[],
        order_cols=order_cols,
        value_col="_grn_one",
        shard_col=shard_col,
        out_col="_grn_prec",
        total_col=total_col,
    )
    return (
        out.withColumn(out_col, (F.col("_grn_prec") + 1).cast("bigint"))
        .drop("_grn_one", "_grn_prec")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list,
    shard_col: str,
    k: int,
    out_col: str = "tile",
) -> DataFrame:
    """Exact global ``ntile(k) OVER (ORDER BY order_cols)`` without the
    single-task total sort.

    ntile is a pure function of (row_number, total count): with
    ``n = q*k + r``, the first ``r`` tiles hold ``q+1`` rows and the
    rest hold ``q``. So: :func:`global_row_number` with its free
    ``total_col`` (the total rides the prefix-sum machinery's tiny
    shard-totals frame — no separate whole-input count pass, which
    would re-execute the input lineage once more) + row-local
    arithmetic. Same shard-column contract as ``global_row_number``.
    The q50/q42 docstrings' historical advice (approx percentile
    boundaries + bucketing join) remains the cheaper path when
    approximate tile EDGES are acceptable; this is the exact form.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    rn = global_row_number(
        df, order_cols, shard_col, out_col="_gnt_rn", total_col="_gnt_n"
    )
    q = F.floor(F.col("_gnt_n") / k)
    r = F.col("_gnt_n") % k
    i = F.col("_gnt_rn") - 1  # 0-based
    big = r * (q + 1)  # rows living in the q+1-sized leading tiles
    tile = (
        F.when(i < big, F.floor(i / (q + 1)))
        .otherwise(r + F.floor((i - big) / q))
        + 1
    )
    return rn.withColumn(out_col, tile.cast("bigint")).drop("_gnt_rn", "_gnt_n")
