"""Perceptual image hashing — the 'ph_hash'/'ph_pairs' labels of
q26_simhash_neardup.

The multimodal dedup surface (operators/phash.py): a 63-bit
integer-DCT pHash per synthetic "image" and the pigeonhole-partitioned
Hamming join over it, both exact-integer end-to-end, so the WHOLE
pipeline — pixel synth, two DCT passes, mean-threshold packing, chunk
join, bit_count verify — hash-verifies against DuckDB. Hosted as q26
labels (the Hamming-distance sibling suite) because the driver records
at most 50 contract entries — the same consolidation rule every
labeled suite follows (SURVEY §2.C).

Reference parity: none (/root/reference has no media processing —
SURVEY.md §2.B); declared engine capability, oracle contract is the
spec.

Labels:

- ``ph_hash``  — (id1=doc_id, id2=the 63-bit pHash) for every
  document's synthetic image (operators/phash.gray16_pattern:
  md5-derived radial blobs, ids grouped in threes sharing a blob +
  per-pixel noise).
- ``ph_pairs`` — (id1, id2, hamming) for all pairs within Hamming 7
  over the deterministic doc_id < 60 subset: ~55 planted same-group
  pairs plus genuinely-similar cross-group blobs. Bounded subset: near
  centers make the full-corpus pair count grow superlinearly with SF
  (that is pHash semantics, not an artifact), so the contract pins a
  fixed id range; the production operator (phash_near_dups) runs
  corpus-wide.

Everything is int64 arithmetic (overflow bounds proven at import in
operators/phash._check_bounds), so Spark's aggregation order, engine
float libraries, and rounding modes are all irrelevant — no banding
needed anywhere, unlike the ln-based 'bm25' label.

The oracle hoists the DCT coefficient table into a one-row CTE
(px_cst) CROSS JOINed where needed: inlining the nested list literal
inside lambdas made DuckDB rebuild it per element (measured 60 s ->
0.2 s for the 500-doc corpus).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from lakeflush_spark.io import load_table, spread_for_compute
from lakeflush_spark.operators.phash import (
    DEFAULT_MAX_HAMMING,
    dct_coeffs,
    gray16_pattern,
    phash_from_gray,
    phash_near_dups,
)

#: the 'ph_pairs' label's deterministic doc subset bound.
PAIRS_ID_BOUND = 60

_C_SQL = (
    "[" + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in dct_coeffs()) + "]"
)

_BASE = (
    "greatest(0, 230 - f * (((p // 16) - a) * ((p // 16) - a)"
    " + ((p % 16) - b) * ((p % 16) - b)))"
)

#: CTE chain ending in ``px_ph`` (per-doc hashes) and ``px_pairs`` —
#: spliced into q26's WITH list (px_-prefixed names to avoid
#: collisions with the host's CTEs).
PHASH_CTES = f"""
px_cst AS (SELECT {_C_SQL} AS cc),
px_pp AS (
    SELECT doc_id,
           1 + ('0x' || substring(md5('a:' || g::VARCHAR), 1, 4))::BIGINT % 14 AS a,
           1 + ('0x' || substring(md5('b:' || g::VARCHAR), 1, 4))::BIGINT % 14 AS b,
           1 + ('0x' || substring(md5('f:' || g::VARCHAR), 1, 4))::BIGINT % 3 AS f,
           ('0x' || substring(md5('i:' || g::VARCHAR), 1, 4))::BIGINT % 2 AS inv
    FROM (SELECT doc_id, doc_id // 3 AS g FROM documents)),
px_gm AS (
    SELECT doc_id,
           list_transform(range(0, 256), p ->
               (CASE WHEN inv = 1 THEN 230 - {_BASE} ELSE {_BASE} END)
               + ('0x' || substring(md5(doc_id::VARCHAR || ':' || p::VARCHAR),
                                    1, 4))::BIGINT % 17) AS gl
    FROM px_pp),
px_tm AS (
    SELECT doc_id,
           list_transform(range(0, 8), u ->
               list_transform(range(0, 16), c ->
                   CAST(list_sum(list_transform(range(0, 16), r ->
                       cc[(u + 1)::INT][(r + 1)::INT]
                       * gl[(r * 16 + c + 1)::INT])) AS BIGINT))) AS tl
    FROM px_gm CROSS JOIN px_cst),
px_am AS (
    SELECT doc_id,
           list_transform(range(1, 64), i ->
               CAST(list_sum(list_transform(range(0, 16), c ->
                   tl[((i // 8) + 1)::INT][(c + 1)::INT]
                   * cc[((i % 8) + 1)::INT][(c + 1)::INT])) AS BIGINT)) AS acl
    FROM px_tm CROSS JOIN px_cst),
px_ph AS (
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 63), i ->
               CASE WHEN acl[(i + 1)::INT] * 63 > s
                    THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END
           )) AS BIGINT) AS phash
    FROM (SELECT doc_id, acl, CAST(list_sum(acl) AS BIGINT) AS s FROM px_am)),
px_pairs AS (
    SELECT x.doc_id AS id1, y.doc_id AS id2,
           CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
    FROM px_ph x JOIN px_ph y ON x.doc_id < y.doc_id
    WHERE x.doc_id < {PAIRS_ID_BOUND} AND y.doc_id < {PAIRS_ID_BOUND}
      AND bit_count(xor(x.phash, y.phash)) <= {DEFAULT_MAX_HAMMING})
"""

#: the q26 UNION ALL branches over the fragment above.
PHASH_BRANCHES = """
SELECT 'ph_hash' AS method, doc_id AS id1, phash AS id2,
       NULL::BIGINT AS hamming
FROM px_ph
UNION ALL
SELECT 'ph_pairs' AS method, id1, id2, hamming FROM px_pairs
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


def phash_label_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'ph_hash' + 'ph_pairs' label rows in q26's
    (method, id1, id2, hamming) schema."""
    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents").select("doc_id"), spark
    )
    # one hash pass feeds both labels; localCheckpoint so the pair
    # join's two sides don't re-run the 3.3k-op/row hash expression
    hashes = docs.select("doc_id", _phash_col()).localCheckpoint()
    hash_rows = hashes.select(
        F.lit("ph_hash").alias("method"),
        F.col("doc_id").alias("id1"),
        F.col("phash").alias("id2"),
        F.lit(None).cast("bigint").alias("hamming"),
    )
    pair_rows = phash_near_dups(
        hashes.where(F.col("doc_id") < PAIRS_ID_BOUND), id_col="doc_id"
    ).select(
        F.lit("ph_pairs").alias("method"), "id1", "id2", "hamming"
    )
    return hash_rows.unionByName(pair_rows)
