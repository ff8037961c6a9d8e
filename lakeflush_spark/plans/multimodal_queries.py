"""Q31–Q33 — multimodal binary-column queries (LLM-data ops).

The documents table stands in for a media table: payload =
UTF-8-encoded text as an opaque ``binary`` column. Q31's metadata
extraction is JVM-only and fully oracled; Q32/Q33 exercise the
mapInPandas decode/feature plumbing (deterministic byte-statistics
stand-in for real codecs — see operators/multimodal.py), which is
deliberately non-SQL-expressible, so the driver applies the
rows-only check and unit tests pin the values (tests/test_multimodal.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.io import load_table, spread_for_compute
from lakeflush_spark.operators.multimodal import (
    extract_features,
    media_metadata,
    sample_frames,
)
from lakeflush_spark.plans.queries import declare


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapInPandas featurizers parallelize by partition — spread the
    # single-row-group scan so Arrow batches hit every core.
    return spread_for_compute(load_table(spark, sf_dir, "documents"), spark).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@declare(
    "q31_multimodal_metadata",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           sha256(text) AS payload_sha256,
           'application/octet-stream' AS sniffed_type
    FROM documents
    ORDER BY media_id
    """,
    "Typed metadata (length, sha256, magic-sniffed type) from opaque binary "
    "payloads — JVM-only projection, scan speed at any scale.",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        media_metadata(_payloads(spark, sf_dir))
        .select("media_id", "n_bytes", "payload_sha256", "sniffed_type")
        .orderBy("media_id")
    )


# The corpus is pure ASCII (verified at every SF), so the payload's
# byte offsets equal the text's char offsets and DuckDB's VARCHAR
# substring/sha256 reproduce byte-slice hashing exactly. byte_sum is
# recomputed in SQL by parsing hex(payload) two chars at a time —
# value-exact integer arithmetic, no float knife-edges anywhere.
_FRAME_SIZE = 256
_FRAME_STRIDE = 2

_Q32_ORACLE = f"""
WITH d AS (
    SELECT doc_id AS media_id, text,
           octet_length(encode(text))::BIGINT AS n_bytes
    FROM documents
),
b AS (
    SELECT media_id,
           COALESCE(list_sum(list_transform(
               range(1, n_bytes + 1),
               i -> ('0x' || substring(hex(encode(text)), 2*i - 1, 2))::BIGINT
           )), 0)::BIGINT AS byte_sum
    FROM d
)
SELECT d.media_id,
       u.i AS frame_idx,
       length(substring(d.text, u.i * {_FRAME_SIZE} + 1, {_FRAME_SIZE}))::BIGINT
         AS frame_bytes,
       sha256(substring(d.text, u.i * {_FRAME_SIZE} + 1, {_FRAME_SIZE}))
         AS frame_sha256,
       d.n_bytes,
       b.byte_sum
FROM d
JOIN b USING (media_id),
LATERAL (
    SELECT UNNEST(range(0,
        GREATEST(1, CEIL(d.n_bytes / {_FRAME_SIZE}.0))::BIGINT,
        {_FRAME_STRIDE})) AS i
) u
ORDER BY media_id, frame_idx
"""


@declare(
    "q32_media_pipeline",
    _Q32_ORACLE,
    "The mapInPandas media surface end-to-end: Arrow-batched feature "
    "extraction (deterministic byte-statistics stand-in for decode+embed) "
    "joined with 1->N frame sampling (every 2nd 256-byte frame with "
    "per-frame sha256 — the video->frames batch shape). Value-exact "
    "oracle: frame hashes + byte sums recomputed in SQL. "
    "(r2: merged q32+q33, upgraded from rows-only to full hash check.)",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = _payloads(spark, sf_dir)
    feats = extract_features(payloads).select("media_id", "n_bytes", "byte_sum")
    frames = sample_frames(payloads, frame_size=_FRAME_SIZE, stride=_FRAME_STRIDE)
    return (
        frames.join(feats, "media_id")
        .select("media_id", "frame_idx", "frame_bytes", "frame_sha256", "n_bytes", "byte_sum")
        .orderBy("media_id", "frame_idx")
    )
