"""Vector functions over embedding columns (``array<float>``).

All JVM-side (``F.zip_with`` / ``F.aggregate`` / ``F.transform``) —
no Python UDF, no Arrow hop. Elements are widened float→double
(exact) before arithmetic, and all folds run left-to-right in array
order, so results are bit-reproducible and match the DuckDB oracle's
identically-ordered ``list_*`` folds.

At 100 TB / billions of vectors: these are map-only projections.
The expensive part of similarity work is the *pairing* strategy
(see operators/similarity.py and operators/dedup.py), not these
per-row expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from lakeflush_spark.functions.text import bind


def to_double_vec(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double vectors."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def jl_sign_matrix(d: int, out_dim: int, seed: str = "jl:") -> list:
    """Deterministic ±1 Johnson–Lindenstrauss projection matrix
    (Achlioptas 2001's database-friendly sign variant), ``out_dim``
    rows of ``d`` signs, derived from ``md5(seed:i:j)`` parity — a
    pure function of (d, out_dim, seed), so BOTH engines (and the
    DuckDB oracle, via an embedded literal) see the same matrix
    without sharing state. Rows are scaled 1/sqrt(out_dim) so
    projected L2 distances estimate original distances unbiasedly."""
    import hashlib

    scale = 1.0 / (out_dim**0.5)
    return [
        [
            scale
            * (
                1.0
                if int(
                    hashlib.md5(f"{seed}{i}:{j}".encode()).hexdigest()[:8], 16
                )
                % 2
                == 0
                else -1.0
            )
            for i in range(d)
        ]
        for j in range(out_dim)
    ]


def random_project(vec: Column, signs: list) -> Column:
    """Project a double vector through a :func:`jl_sign_matrix` — the
    JL dimensionality reduction that makes downstream LSH/IVF/near-dup
    shuffles carry ``out_dim/d`` of the bytes while preserving
    pairwise distances within the JL distortion bound. Entirely
    JVM-side: one sequential-order dot product per output coordinate
    (the fold order every oracle replay depends on), the sign matrix
    riding the plan as a small literal (out_dim × d doubles — KBs,
    not the r5 centroid-literal hazard)."""
    mat = F.array(
        *[F.array(*[F.lit(float(s)) for s in row]) for row in signs]
    )
    return F.transform(mat, lambda row: dot_product(vec, row))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a double vector (zero vectors pass through).

    Nested ``bind`` so the norm fold runs once per row, not once per
    element — the map-only prep step that turns cosine similarity into
    a plain dot product downstream (halves the per-pair cost of every
    ANN / near-dup join).
    """

    def with_vec(v: Column) -> Column:
        def with_norm(nrm: Column) -> Column:
            return F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)

        return bind(l2_norm(v), with_norm)

    return bind(a, with_vec)


def quantize_int8(a: Column) -> Column:
    """Symmetric per-vector int8 quantization.

    Returns ``struct<scale: double, q: array<tinyint>>`` with
    ``scale = max(|x|)/127`` and ``q = round(x/scale)`` — the standard
    4x shrink for embedding storage and shuffle width at 100 TB scale
    (the band/bucket joins carry 1-byte lanes instead of 4-byte
    floats). Zero vectors quantize to scale 0 and all-zero lanes.
    Reconstruction error is bounded by scale/2 per element
    (``tests/test_vectors.py`` asserts the bound and cosine fidelity).
    """

    def with_vec(v: Column) -> Column:
        def with_scale(scale: Column) -> Column:
            zero8 = F.lit(0).cast("tinyint")
            q = F.when(
                scale > 0,
                F.transform(v, lambda x: F.round(x / scale).cast("int").cast("tinyint")),
            ).otherwise(F.transform(v, lambda x: zero8))
            return F.struct(scale.alias("scale"), q.alias("q"))

        return bind(
            F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0), with_scale
        )

    return bind(a, with_vec)


def dequantize_int8(qs: Column) -> Column:
    """Inverse of ``quantize_int8``: q * scale back to double."""
    return bind(
        qs, lambda s: F.transform(s["q"], lambda x: x.cast("double") * s["scale"])
    )


def int8_roundtrip_verdict(nv: Column, dv: Column) -> Column:
    """True iff ``dv`` is a faithful int8 round-trip of the already
    unit-normalized ``nv`` (both ``array<double>``).

    The contract being asserted (map-only JVM Column expression — no
    shuffle, no Python):

    - ``nv`` has unit norm (|norm - 1| < 1e-9), or is the zero vector
      (which must round-trip to exact zeros);
    - every reconstructed element is within scale/2 (+ float eps) of
      the original, where scale = max|nv| / 127 — ``quantize_int8``'s
      documented per-element bound;
    - round-trip cosine(nv, dv) >= 0.999.

    Built for verdict-row oracles (q29 'fidelity'): int8 lanes are not
    bit-replayable in ANSI SQL, so the engine asserts the bound and
    the driver hash-checks the boolean. Kept as a standalone helper so
    tests can plant a violating ``dv`` and watch the verdict flip.
    """
    nrm = l2_norm(nv)
    max_err = F.array_max(F.zip_with(nv, dv, lambda a, b: F.abs(a - b)))
    scale = F.array_max(F.transform(nv, F.abs)) / F.lit(127.0)
    dot = _fold_sum(F.zip_with(nv, dv, lambda a, b: a * b))
    dnrm = l2_norm(dv)
    # coalesce(..., False): a planted all-zero dv against a unit nv
    # makes dot/dnrm = 0/0 = NULL, which must read as a FAILED verdict
    # (not a NULL slipping through a hash-verified boolean column)
    return F.coalesce(
        F.when(nrm == 0.0, dnrm == 0.0).otherwise(
            (F.abs(nrm - 1.0) < 1e-9)
            & (max_err <= scale / 2 + F.lit(1e-9))
            & (dnrm > 0.0)
            & (dot / dnrm >= 0.999)
        ),
        F.lit(False),
    )


def sign_lsh_bucket(vec: Column | str, n_bits: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH bucket id in [0, 2**n_bits).

    Bit i = sign of coordinate i (an axis-aligned instance of
    sign-random-projection LSH; deterministic, engine-independent, and
    exactly expressible in the SQL oracle). Nearby vectors (cosine)
    agree on most signs, so they collide with high probability.

    Scale path: bucketing turns the O(N·Q) brute-force scan into a
    bucket-equi-join — a plain shuffle join on the bucket id that AQE
    load-balances; recall is traded for the 2**n_bits fan-in reduction.
    """
    v = F.col(vec) if isinstance(vec, str) else vec
    bucket = F.lit(0).cast("bigint")
    for i in range(n_bits):
        bit = F.when(F.element_at(v, i + 1) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("bigint")
    return bucket
