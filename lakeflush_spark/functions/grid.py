"""Integer-grid snapping for cross-engine float determinism.

The engine-wide recipe (first used by q41's 'bm25' label, r11; adopted
by the DSIR chain in r12): any transcendental (``ln``) whose result
feeds a HASH-VERIFIED value is snapped to a 1e-6 integer grid with
half-up rounding, and any value whose pre-snap position lies within
``EDGE_BAND`` grid units (1e-9 in score units) of a rounding boundary
marks the row *masked* — both engines agree on every unmasked snapped
BIGINT exactly, and masked rows carry NULL / are counted separately,
so disagreement is impossible by construction.

Why this works: engines differ on ``ln`` by ≤1 ulp (measured drift
~1e-15 relative → ~1e-9 absolute in 1e-6-grid units for ln magnitudes
up to ~15). The band sits six orders above the drift and six below the
grid step. Downstream sums are BIGINT additions — order-free, so
Spark's nondeterministic partial-aggregation order cannot perturb a
hash the way float sums can.

Reference parity: none — /root/reference exposes no float math at all;
this is infrastructure for the oracle contract.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column

#: rounding-boundary band, in grid units (1e-9 in value units — six
#: orders above the measured ~1e-15-relative cross-engine ln drift).
EDGE_BAND = 1e-3

#: the grid: values are kept as BIGINT multiples of 1e-6.
GRID = 1_000_000.0


def snap_e6(value: Column) -> Column:
    """``value`` snapped to the 1e-6 integer grid, half-up: the BIGINT
    ``floor(value*1e6 + 0.5)``."""
    return F.floor(value * F.lit(GRID) + F.lit(0.5)).cast("bigint")


def edge_e6(value: Column, band: float = EDGE_BAND) -> Column:
    """True when ``value*1e6`` lies within ``band`` of a half-up
    rounding boundary — the row must be masked, not trusted."""
    s6 = value * F.lit(GRID)
    return F.abs(s6 - F.floor(s6) - F.lit(0.5)) < F.lit(float(band))


def py_snap_e6(value: float) -> int:
    """Driver-side twin of :func:`snap_e6` (exact same IEEE ops)."""
    return int(math.floor(value * GRID + 0.5))


def py_edge_e6(value: float, band: float = EDGE_BAND) -> bool:
    """Driver-side twin of :func:`edge_e6`."""
    s6 = value * GRID
    return abs(s6 - math.floor(s6) - 0.5) < band


def sql_snap_e6(expr: str) -> str:
    """DuckDB SQL twin of :func:`snap_e6` (splice into oracle CTEs)."""
    return f"CAST(floor(({expr}) * {GRID!r} + 0.5) AS BIGINT)"


def sql_edge_e6(expr: str, band: float = EDGE_BAND) -> str:
    """DuckDB SQL twin of :func:`edge_e6`."""
    return (
        f"(abs(({expr}) * {GRID!r} - floor(({expr}) * {GRID!r}) - 0.5)"
        f" < {float(band)!r})"
    )
