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


@declare(
    "q32_media_features",
    None,  # mapInPandas featurizer: not SQL-expressible; rows-only check
    "Arrow-batched feature extraction over binary payloads (mapInPandas); "
    "deterministic byte-statistics stand-in for decode+embed.",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_payloads(spark, sf_dir))
    return feats.select(
        "media_id", "n_bytes", F.round("feat_mean", 4).alias("feat_mean")
    ).orderBy("media_id")


@declare(
    "q33_frame_sample",
    None,  # 1->N fan-out inside mapInPandas; rows-only check
    "Frame sampling: each payload fans out to every 2nd 256-byte frame "
    "with per-frame hashes (video->frames shape, stubbed on bytes).",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_payloads(spark, sf_dir), frame_size=256, stride=2).orderBy(
        "media_id", "frame_idx"
    )
