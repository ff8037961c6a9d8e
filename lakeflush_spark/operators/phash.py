"""Perceptual image hashing (pHash) and Hamming near-dup detection.

The multimodal sibling of MinHash/SimHash text dedup: a 63-bit
DCT-based perceptual hash over grayscale pixels, robust to uniform
brightness shifts and mild noise, plus a pigeonhole-partitioned
Hamming join to find near-duplicate images without an all-pairs scan.

Reference parity: none — /root/reference has no media processing
(SURVEY.md §2.B); declared engine capability, oracle contract is the
spec (q26's 'ph_hash'/'ph_pairs' labels, plans/phash_queries.py).

Why an INTEGER DCT
------------------
The classic pHash recipe (resize → 2-D DCT → threshold the low
frequencies against their median/mean) uses float cosines, which are
not bit-specified across engines — a hash whose bits could flip with
the math library is useless as a dedup key and impossible to
oracle-verify. This implementation fixes both: the cosine basis is
quantized ONCE to 14-bit fixed point (``DCT_SCALE``), and everything
downstream is exact int64 arithmetic — pixel sums, the two matrix
passes, and the ``63·d[i] > Σ d`` mean-threshold comparison (no
division). The same integer tables drive the JVM expression twin, the
numpy batch path, and the DuckDB oracle, so all three agree
bit-for-bit by construction. Overflow headroom is proven in
``_check_bounds``: the worst-case |coefficient| is ~1.75e16 and the
worst comparison operand ~1.1e18, both under 2^63.

Scale shape (100 TB of images)
------------------------------
- Hashing is embarrassingly parallel: Arrow-batched ``mapInPandas``
  over binary payloads (decode + pool + two small integer matmuls per
  image), no shuffle, output partitioning == input partitioning.
- Near-dup pairs: a 63-bit hash within Hamming distance ``t`` of
  another must share at least one of ``t+1`` disjoint bit chunks
  (pigeonhole), so candidates come from ``t+1`` chunk equi-joins —
  the SimHash recipe (operators/dedup.simhash_near_dups) on the
  perceptual hash. Bodies never shuffle; only (id, hash, chunk) rows.
- Hot chunks (e.g. monochrome images all hashing to 0) are the same
  skew risk as hot LSH bands; cap with the dedup module's bucket-cap
  pattern if a corpus needs it.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from lakeflush_spark.functions.text import bind

#: pooled grayscale side length (the "resize" target) and DCT block.
PHASH_N = 16
PHASH_K = 8
#: fixed-point scale for the quantized cosine basis.
DCT_SCALE = 1 << 14
#: number of hash bits: the PHASH_K x PHASH_K low-frequency block
#: minus the DC coefficient — 63 bits, fitting a non-negative int64.
PHASH_BITS = PHASH_K * PHASH_K - 1
#: default Hamming radius for near-dup detection.
DEFAULT_MAX_HAMMING = 7


def dct_coeffs() -> list[list[int]]:
    """The 14-bit fixed-point DCT-II basis, ``PHASH_K x PHASH_N``:
    ``C[u][r] = round(DCT_SCALE * cos(pi * (2r+1) * u / (2 * PHASH_N)))``.

    Unnormalized (no sqrt factors): every AC row has the same norm, and
    the hash thresholds ACs against their own mean, so normalization
    would cancel anyway; DC is excluded from the hash entirely.
    """
    return [
        [
            int(round(DCT_SCALE * math.cos(math.pi * (2 * r + 1) * u / (2 * PHASH_N))))
            for r in range(PHASH_N)
        ]
        for u in range(PHASH_K)
    ]


def _check_bounds() -> None:
    # worst-case magnitudes, asserted once at import: every
    # intermediate fits int64 with >3 bits of headroom
    t_max = PHASH_N * DCT_SCALE * 255
    d_max = PHASH_N * DCT_SCALE * t_max
    cmp_max = PHASH_BITS * d_max
    assert cmp_max < 2**62, "integer DCT would overflow int64"


_check_bounds()


#: synthetic-image knobs for the contract stand-in (gray16_pattern):
#: docs in groups of GROUP_SIZE share a blob; noise is NOISE_LEVELS
#: gray levels per pixel.
GROUP_SIZE = 3
NOISE_LEVELS = 17


def _md5_int(key: Column) -> Column:
    """First 16 md5 bits of a string column as BIGINT — the repo's
    standard engine-portable deterministic hash (q24/q60 recipe)."""
    return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("bigint")


def gray16_pattern(id_col: Column | str) -> Column:
    """Deterministic synthetic 16x16 grayscale "image" per id: a
    radial blob whose center/radius/polarity derive (via md5) from the
    id's GROUP, plus per-(id, pixel) md5 noise in [0, NOISE_LEVELS).

    The contract corpus has no real images, so — like q32's
    byte-statistics featurizer — the oracle-checkable surface
    synthesizes pixels deterministically. Grouping ids by
    ``id // GROUP_SIZE`` plants true near-duplicate images (same blob,
    noise-only differences: measured intra-group Hamming mean ~3) in a
    sea of distinct ones (inter-group mean ~32), so the Hamming join
    finds real structure and the noise exercises pHash's robustness —
    the property that makes it a perceptual hash rather than a
    checksum. Text-derived pixels were measured NOT to work here:
    word-level edits shift every downstream character, landing planted
    text near-dups at background Hamming distance (~25-40), so the
    synth is id-driven instead. JVM-only (md5 + integer arithmetic in
    a transform), scan speed; the real-image path is phash_images.

    ``pixel(r, c) = base + md5(id:p) % 17`` with
    ``base = max(0, 230 - f·((r-a)² + (c-b)²))`` (inverted to
    ``230 - base`` for half the groups), ``a, b ∈ [1, 14]``,
    ``f ∈ [1, 3]`` all md5-derived from the group id.
    """
    i = (F.col(id_col) if isinstance(id_col, str) else id_col).cast("bigint")
    g = F.floor(i / F.lit(GROUP_SIZE)).cast("bigint")

    def gmd5(prefix: str) -> Column:
        return _md5_int(F.concat(F.lit(prefix), g.cast("string")))

    params = F.struct(
        (F.lit(1).cast("bigint") + gmd5("a:") % 14).alias("a"),
        (F.lit(1).cast("bigint") + gmd5("b:") % 14).alias("b"),
        (F.lit(1).cast("bigint") + gmd5("f:") % 3).alias("f"),
        (gmd5("i:") % 2).alias("inv"),
        i.alias("id"),
    )

    def pixels(pp: Column) -> Column:
        def px(p: Column) -> Column:
            r = F.shiftright(p, 4).cast("bigint")
            c = p.bitwiseAND(F.lit(15)).cast("bigint")
            d2 = (r - pp.a) * (r - pp.a) + (c - pp.b) * (c - pp.b)
            base = F.greatest(
                F.lit(0).cast("bigint"), F.lit(230) - pp.f * d2
            )
            base = F.when(pp.inv == 1, F.lit(230) - base).otherwise(base)
            nz = (
                _md5_int(
                    F.concat(
                        pp.id.cast("string"), F.lit(":"), p.cast("string")
                    )
                )
                % NOISE_LEVELS
            )
            return base + nz

        return F.transform(
            F.sequence(F.lit(0), F.lit(PHASH_N * PHASH_N - 1)), px
        )

    return bind(params, pixels)


def phash_from_gray(gray_col: Column) -> Column:
    """63-bit perceptual hash from a 256-element row-major int array.

    Pure JVM expression (nested HOF folds over the bound pixel array):
    two fixed-point DCT passes, then ``bit[i] = 63·d[i] > Σ_AC d``
    packed little-endian into a BIGINT. Bit i corresponds to AC
    coefficient ``(u, v) = ((i+1) div 8, (i+1) mod 8)``.
    """
    C = dct_coeffs()

    def hash_from(g: Column) -> Column:
        # row pass: t[u][c] = sum_r C[u][r] * g[r*N + c]  (8 x 16)
        # (a one-arg lambda per u — Spark treats a two-arg transform
        # lambda as (element, index), so u must close over a factory)
        def row_fn(u: int):
            return lambda c: sum(
                (
                    F.lit(C[u][r]) * F.element_at(g, c + F.lit(r * PHASH_N + 1))
                    for r in range(1, PHASH_N)
                ),
                F.lit(C[u][0]) * F.element_at(g, c + F.lit(1)),
            )

        t_rows = F.array(
            *[
                F.transform(F.sequence(F.lit(0), F.lit(PHASH_N - 1)), row_fn(u))
                for u in range(PHASH_K)
            ]
        )

        def ac_from(t: Column) -> Column:
            # column pass, flattened to the 63 AC coefficients in
            # (u, v) row-major order skipping (0, 0):
            # d[u][v] = sum_c t[u][c] * C[v][c]
            def d(u: int, v: int) -> Column:
                row = F.element_at(t, u + 1)
                return sum(
                    (
                        F.element_at(row, c + 1) * F.lit(C[v][c])
                        for c in range(1, PHASH_N)
                    ),
                    F.element_at(row, 1) * F.lit(C[v][0]),
                )

            ac = F.array(
                *[
                    d((i + 1) // PHASH_K, (i + 1) % PHASH_K)
                    for i in range(PHASH_BITS)
                ]
            )

            def pack(acb: Column) -> Column:
                s = F.aggregate(
                    acb, F.lit(0).cast("bigint"), lambda acc, x: acc + x
                )

                def from_sum(ss: Column) -> Column:
                    bits = [
                        (
                            F.element_at(acb, i + 1) * F.lit(PHASH_BITS) > ss
                        ).cast("bigint")
                        for i in range(PHASH_BITS)
                    ]
                    return sum(
                        (F.shiftleft(b, i) for i, b in enumerate(bits[1:], 1)),
                        bits[0],
                    )

                return bind(s, from_sum)

            return bind(ac, pack)

        return bind(t_rows, ac_from)

    return bind(gray_col, hash_from)


def phash_core_numpy(gray) -> int:
    """The same integer pHash over a numpy 2-D uint8/int array of any
    shape: average-pool (integer mean) to PHASH_N x PHASH_N, then the
    identical fixed-point DCT + mean-threshold packing. Returns a
    non-negative int < 2**63.

    Pooling uses exact integer division of block sums (floor), so two
    runs — and the JVM twin fed the same pooled matrix — agree bitwise.
    """
    import numpy as np

    g = np.asarray(gray, dtype=np.int64)
    if g.ndim == 3:  # RGB(A) -> luma via integer BT.601-ish weights
        w = np.array([299, 587, 114], dtype=np.int64)
        g = (g[:, :, :3] * w).sum(axis=2) // 1000
    h, wd = g.shape
    if h < PHASH_N or wd < PHASH_N:  # upscale tiny images by repetition
        g = np.tile(g, (PHASH_N // h + 1, PHASH_N // wd + 1))
        h, wd = g.shape
    # integer average pool to N x N: sum each block, floor-divide
    ry, rx = h // PHASH_N, wd // PHASH_N
    g = g[: ry * PHASH_N, : rx * PHASH_N]
    pooled = (
        g.reshape(PHASH_N, ry, PHASH_N, rx).sum(axis=(1, 3)) // (ry * rx)
    ).astype(np.int64)
    return phash_pooled_numpy(pooled)


def phash_pooled_numpy(pooled) -> int:
    """Integer DCT + packing over an already 16x16 int matrix — the
    exact arithmetic twin of ``phash_from_gray``."""
    import numpy as np

    C = np.array(dct_coeffs(), dtype=np.int64)  # 8 x 16
    g = np.asarray(pooled, dtype=np.int64).reshape(PHASH_N, PHASH_N)
    t = C @ g  # 8 x 16
    d = t @ C.T  # 8 x 8
    ac = d.flatten()[1:]  # drop DC
    s = int(ac.sum())
    out = 0
    for i, v in enumerate(ac):
        if int(v) * PHASH_BITS > s:
            out |= 1 << i
    return out


_PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)


def phash_images(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder=None,
) -> DataFrame:
    """Per-image perceptual hashes from encoded payloads (the REAL
    image path): Arrow-batched mapInPandas, ``decoder(bytes) ->
    numpy (h, w[, ch])`` per row — defaults to the pure-Python PNG
    decoder (operators/png_codec). Rows whose payload fails to decode
    are dropped (corrupt-input skip, the O19 error-policy analog) —
    ANY exception from the decoder counts as a corrupt input (r12: a
    PNG-signed payload with a truncated IHDR raises struct.error and a
    corrupt IDAT zlib stream raises zlib.error, not ValueError; a
    user-supplied decoder can raise anything), so one bad row can
    never fail the whole task / micro-batch.
    """
    if decoder is None:
        from lakeflush_spark.operators.png_codec import decode_png as decoder

    dec = decoder

    def hash_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = dec(bytes(payload))
                except Exception:  # noqa: BLE001 — skip-corrupt policy
                    continue
                out.append((int(mid), phash_core_numpy(arr)))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return df.select(id_col, payload_col).mapInPandas(hash_batch, _PHASH_SCHEMA)


def phash_chunks(hash_col: Column | str, max_hamming: int = DEFAULT_MAX_HAMMING) -> list[Column]:
    """Split the 63-bit hash into ``max_hamming + 1`` disjoint bit
    chunks (pigeonhole: two hashes within Hamming ``t`` agree on at
    least one of ``t+1`` chunks)."""
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    n = max_hamming + 1
    bounds = [PHASH_BITS * i // n for i in range(n + 1)]
    return [
        F.shiftrightunsigned(h, bounds[i])
        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1).cast("bigint"))
        .alias(f"_pc{i}")
        for i in range(n)
    ]


def phash_near_dups(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = DEFAULT_MAX_HAMMING,
) -> DataFrame:
    """(id1, id2, hamming) pairs with Hamming distance <= max_hamming.

    Candidate generation is ``max_hamming + 1`` chunk equi-joins (one
    exploded equi-join on (chunk_idx, chunk_value)), then an exact
    ``bit_count(xor)`` verify — never all-pairs. ``id1 < id2``;
    duplicates from multi-chunk agreement are collapsed map-side by
    the distinct on the verified pairs.
    """
    if not 0 <= max_hamming < PHASH_BITS:
        raise ValueError("max_hamming must be in [0, 63)")
    n = max_hamming + 1
    base = hashes.select(
        F.col(id_col).alias("_pid"),
        F.col(hash_col).alias("_ph"),
        F.posexplode(F.array(*phash_chunks(hash_col, max_hamming))).alias(
            "_ci", "_cv"
        ),
    )
    a, b = base.alias("a"), base.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._ci") == F.col("b._ci"))
            & (F.col("a._cv") == F.col("b._cv"))
            & (F.col("a._pid") < F.col("b._pid")),
        )
        .select(
            F.col("a._pid").alias("id1"),
            F.col("b._pid").alias("id2"),
            F.bit_count(
                F.col("a._ph").bitwiseXOR(F.col("b._ph"))
            ).cast("bigint").alias("hamming"),
        )
        .where(F.col("hamming") <= n - 1)
        .distinct()
    )
    return cand


def dedup_images(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = DEFAULT_MAX_HAMMING,
    decoder=None,
    max_iters: int = 20,
) -> DataFrame:
    """Drop near-duplicate images, keeping one per perceptual cluster.

    The one-call composition: :func:`phash_images` (decode + hash,
    map-only), :func:`phash_near_dups` (pigeonhole chunk join),
    connected components over the verified pairs
    (operators/dedup.near_dup_clusters), then an anti-join dropping
    every non-minimum member. All other columns pass through. Rows
    whose payload fails to decode are in no pair, so they always
    survive (corrupt inputs are skipped, not dropped — the O19
    error-policy analog; run :func:`phash_images` directly to audit
    which those are).
    """
    from lakeflush_spark.operators.dedup import near_dup_clusters

    hashes = phash_images(
        df, id_col=id_col, payload_col=payload_col, decoder=decoder
    )
    pairs = phash_near_dups(hashes, id_col="media_id", max_hamming=max_hamming)
    clusters = near_dup_clusters(pairs, max_iters=max_iters)
    losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
