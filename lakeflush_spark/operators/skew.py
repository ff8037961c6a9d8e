"""Skew-mitigating join utilities.

At 100 TB a single hot key (null-heavy foreign keys, celebrity users,
default enum values) puts one shuffle partition orders of magnitude
over the rest and stalls the stage on one straggler task.

Mitigation ladder, in order of preference:

1. **Broadcast** the small side (`F.broadcast`) — no shuffle at all.
2. **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on in
   :func:`lakeflush_spark.session.get_spark`) — splits oversized
   partitions at runtime; works for sort-merge joins it plans.
3. **Manual salting** (this module) — for the cases AQE can't fix:
   the hot side is too big to broadcast AND the join degenerates to a
   single hot key that even a split partition can't spread (AQE splits
   a partition, but one identical join key still hashes to one split
   on the *build* side replication).

The reference has no join operator at all (SURVEY §2.B); this is part
of the engine's scale surface, exercised by tests rather than a
declared query (its result is by construction identical to the plain
join it replaces).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join a skewed large side with a modest dimension side,
    spreading every hot key over ``salt`` shuffle partitions.

    - ``skewed`` rows get a deterministic salt in ``[0, salt)`` from a
      row hash (xxhash64 over all columns — no RNG, so retried tasks
      produce identical output; Spark re-executes lost tasks and a
      nondeterministic salt would double/lose rows on retry).
    - ``small`` is replicated ``salt`` times via ``explode`` (cost:
      |small| × salt rows through the shuffle — choose salt so that
      stays far below the skewed side's volume).
    - Join key becomes ``(on, _salt)``; result drops the helper cols.

    Supported ``how``: inner / left (semantics preserved because every
    skewed row carries exactly one salt value and every small row
    exists for all salt values).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_col = F.pmod(F.xxhash64(*skewed.columns), F.lit(salt)).cast("int")
    left = skewed.withColumn("_salt", salt_col)
    right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = left.join(right, on=[on, "_salt"], how=how)
    return out.drop("_salt")
