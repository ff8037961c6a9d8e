"""Q64 — perceptual image hashing + Hamming near-dup detection.

The multimodal dedup surface (operators/phash.py): a 63-bit
integer-DCT pHash per synthetic "image" and the pigeonhole-partitioned
Hamming join over it, both exact-integer end-to-end, so the WHOLE
pipeline — pixel synth, two DCT passes, mean-threshold packing, chunk
join, bit_count verify — hash-verifies against DuckDB.

Reference parity: none (/root/reference has no media processing —
SURVEY.md §2.B); declared engine capability, oracle contract is the
spec.

Labels:

- ``hash``  — (id1=doc_id, id2=the 63-bit pHash) for every document's
  synthetic image (operators/phash.gray16_pattern: md5-derived radial
  blobs, ids grouped in threes sharing a blob + per-pixel noise).
- ``pairs`` — (id1, id2, hamming) for all pairs within Hamming 7 over
  the deterministic doc_id < 60 subset: ~55 planted same-group pairs
  plus genuinely-similar cross-group blobs. Bounded subset: near
  centers make the full-corpus pair count grow superlinearly with SF
  (that is pHash semantics, not an artifact), so the contract pins a
  fixed id range; the production operator (phash_near_dups) runs
  corpus-wide.

Everything is int64 arithmetic (overflow bounds proven at import in
operators/phash._check_bounds), so Spark's aggregation order, engine
float libraries, and rounding modes are all irrelevant — no banding
needed anywhere, unlike the ln-based q63.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from lakeflush_spark.io import load_table, spread_for_compute
from lakeflush_spark.operators.phash import (
    DEFAULT_MAX_HAMMING,
    PHASH_BITS,
    dct_coeffs,
    gray16_pattern,
    phash_from_gray,
    phash_near_dups,
)
from lakeflush_spark.plans.queries import declare

#: the 'pairs' label's deterministic doc subset bound.
PAIRS_ID_BOUND = 60

_C_SQL = (
    "[" + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in dct_coeffs()) + "]"
)

_BASE = (
    "greatest(0, 230 - f * (((p // 16) - a) * ((p // 16) - a)"
    " + ((p % 16) - b) * ((p % 16) - b)))"
)

_ORACLE = f"""
WITH cst AS (SELECT {_C_SQL} AS cc),
pp AS (
    SELECT doc_id,
           1 + ('0x' || substring(md5('a:' || g::VARCHAR), 1, 4))::BIGINT % 14 AS a,
           1 + ('0x' || substring(md5('b:' || g::VARCHAR), 1, 4))::BIGINT % 14 AS b,
           1 + ('0x' || substring(md5('f:' || g::VARCHAR), 1, 4))::BIGINT % 3 AS f,
           ('0x' || substring(md5('i:' || g::VARCHAR), 1, 4))::BIGINT % 2 AS inv
    FROM (SELECT doc_id, doc_id // 3 AS g FROM documents)),
gm AS (
    SELECT doc_id,
           list_transform(range(0, 256), p ->
               (CASE WHEN inv = 1 THEN 230 - {_BASE} ELSE {_BASE} END)
               + ('0x' || substring(md5(doc_id::VARCHAR || ':' || p::VARCHAR),
                                    1, 4))::BIGINT % 17) AS gl
    FROM pp),
tm AS (
    SELECT doc_id,
           list_transform(range(0, 8), u ->
               list_transform(range(0, 16), c ->
                   CAST(list_sum(list_transform(range(0, 16), r ->
                       cc[(u + 1)::INT][(r + 1)::INT]
                       * gl[(r * 16 + c + 1)::INT])) AS BIGINT))) AS tl
    FROM gm CROSS JOIN cst),
am AS (
    SELECT doc_id,
           list_transform(range(1, 64), i ->
               CAST(list_sum(list_transform(range(0, 16), c ->
                   tl[((i // 8) + 1)::INT][(c + 1)::INT]
                   * cc[((i % 8) + 1)::INT][(c + 1)::INT])) AS BIGINT)) AS acl
    FROM tm CROSS JOIN cst),
ph AS (
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 63), i ->
               CASE WHEN acl[(i + 1)::INT] * 63 > s
                    THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END
           )) AS BIGINT) AS phash
    FROM (SELECT doc_id, acl, CAST(list_sum(acl) AS BIGINT) AS s FROM am)),
pairs AS (
    SELECT x.doc_id AS id1, y.doc_id AS id2,
           CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
    FROM ph x JOIN ph y ON x.doc_id < y.doc_id
    WHERE x.doc_id < {PAIRS_ID_BOUND} AND y.doc_id < {PAIRS_ID_BOUND}
      AND bit_count(xor(x.phash, y.phash)) <= {DEFAULT_MAX_HAMMING})
SELECT 'hash' AS label, doc_id AS id1, phash AS id2, NULL::BIGINT AS hamming
FROM ph
UNION ALL
SELECT 'pairs' AS label, id1, id2, hamming FROM pairs
ORDER BY label, id1, id2
"""

# the pHash-over-pattern Column is pure (md5 + integer folds over an
# unresolved 'doc_id' attribute) but ~6k py4j calls to assemble — the
# q60/q18 build-memo recipe applies
_PHASH_COL: list[Column] = []


def _phash_col() -> Column:
    if not _PHASH_COL:
        _PHASH_COL.append(
            phash_from_gray(gray16_pattern("doc_id")).alias("phash")
        )
    return _PHASH_COL[0]


@declare(
    "q64_phash",
    _ORACLE,
    "Perceptual image hashing end-to-end in exact int64: fixed-point "
    "DCT pHash per synthetic image (md5 blob patterns; real images go "
    "through phash_images' decode path), plus pigeonhole chunk-join "
    "Hamming near-dups — 'hash' covers every doc, 'pairs' the "
    f"deterministic doc_id<{PAIRS_ID_BOUND} subset at radius "
    f"{DEFAULT_MAX_HAMMING} of {PHASH_BITS} bits.",
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents").select("doc_id"), spark
    )
    # one hash pass feeds both labels; localCheckpoint so the pair
    # join's two sides don't re-run the 3.3k-op/row hash expression
    hashes = docs.select("doc_id", _phash_col()).localCheckpoint()
    hash_rows = hashes.select(
        F.lit("hash").alias("label"),
        F.col("doc_id").alias("id1"),
        F.col("phash").alias("id2"),
        F.lit(None).cast("bigint").alias("hamming"),
    )
    pair_rows = phash_near_dups(
        hashes.where(F.col("doc_id") < PAIRS_ID_BOUND), id_col="doc_id"
    ).select(
        F.lit("pairs").alias("label"), "id1", "id2", "hamming"
    )
    return hash_rows.unionByName(pair_rows).orderBy("label", "id1", "id2")
