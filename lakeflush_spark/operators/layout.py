"""Multi-dimensional data layout (Z-order clustering) for parquet lakes.

Compaction (`operators/compaction.py`) fixes FILE GRANULARITY; this
module fixes FILE CONTENT: co-locating rows that are close in several
filter columns at once, so parquet row-group min/max statistics skip
most of the lake for multi-column box predicates. One-dimensional
sorting only prunes its leading column; bit-interleaved Z-values give
every listed column pruning power — the standard lakehouse OPTIMIZE
ZORDER maintenance job, expressed Spark-first.

Scale design:

- Per column, values are normalized to a ``2**bits_per_col`` integer
  grid with min/max from ONE aggregate pass (2N numbers to the
  driver — constant, not data-sized).
- The Z-value is pure JVM bit arithmetic (shift/or chains inside
  whole-stage codegen) — map-only.
- ``repartitionByRange`` on the Z-value is the single shuffle (range
  exchange with sampled bounds), followed by ``sortWithinPartitions``
  so row groups inside every file carry tight min/max ranges.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interleave_bits(cols: list[Column], bits_per_col: int) -> Column:
    """Bit-interleave pre-normalized non-negative ints into a Z-value.

    Column j's bit i lands at output position ``i * len(cols) + j`` —
    the classic Morton code. len(cols) * bits_per_col must be < 63.
    """
    n = len(cols)
    if n * bits_per_col >= 63:
        raise ValueError("total interleaved bits must fit a signed 64-bit int")
    z = F.lit(0).cast("bigint")
    for i in range(bits_per_col):
        for j, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 12
) -> tuple[DataFrame, Column]:
    """(df, zkey column) with each col min/max-normalized to the grid.

    One aggregate pass collects the 2*len(cols) bounds; constant-width
    columns degrade to 0 (their bits carry nothing, harmlessly).
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    bounds = df.agg(*aggs).collect()[0]
    grid = (1 << bits_per_col) - 1
    normed = []
    for c in cols:
        raw_mn, raw_mx = bounds[f"_mn_{c}"], bounds[f"_mx_{c}"]
        if raw_mn is None or raw_mx is None:
            # empty frame or all-NULL column: min/max aggregate to NULL.
            # Treat as a constant column (contributes no bits) instead
            # of an opaque float(None) TypeError.
            normed.append(F.lit(0))
            continue
        try:
            mn = float(raw_mn)
            span = float(raw_mx) - mn
        except (TypeError, ValueError):
            raise ValueError(
                f"zorder_key column {c!r} is not numeric "
                f"(min={raw_mn!r}); cast it before clustering"
            ) from None
        if span <= 0:
            normed.append(F.lit(0))
        else:
            normed.append(
                F.least(
                    F.lit(grid),
                    F.floor((F.col(c).cast("double") - mn) / span * grid).cast("int"),
                )
            )
    return df, interleave_bits(normed, bits_per_col)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits_per_col: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet Z-clustered on ``cols``.

    Range-partition + in-partition sort on the Z-value: every output
    file (and every row group inside it) covers a compact hyper-box of
    the listed columns, so a reader filtering on ANY of them prunes
    via footer statistics. Verified in ``tests/test_layout.py``: a
    2-D box predicate touches a fraction of the clustered files vs
    nearly all unclustered ones.
    """
    df2, zkey = zorder_key(df, cols, bits_per_col)
    (
        df2.withColumn("_z", zkey)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
