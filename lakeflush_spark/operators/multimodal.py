"""Multimodal (image/audio/video) column plumbing for the data pipeline.

Convention: media rides in DataFrames as an opaque ``binary`` payload
column plus typed metadata columns — the same "bytes in, bytes out"
stance the reference takes for text records
(`lakeflush/core/collector.py:97-103` treats every record as an opaque
str), extended with the schema/partitioning/UDF plumbing Spark needs:

- **metadata extraction** (`media_metadata`): JVM-side only — byte
  length, sha256, magic-prefix sniffing — stays in whole-stage
  codegen, scan-speed at 100 TB.
- **decode / feature-extract** (`extract_features`): `mapInPandas`
  over Arrow record batches — the industrial shape for Python-side
  media work (decode libs are C anyway; the win is batching, not
  avoiding Python). Real decoders (PIL/librosa/av) are NOT in this
  container, so decoding is STUBBED: `decode_media` raises
  `NotImplementedError` for real codecs, and the deterministic
  byte-statistics fake below stands in so the Spark-side plumbing
  (schema, batch shape, partition preservation) is fully real and
  tested.
- **frame sampling** (`sample_frames`): one input row fans out to N
  frame rows inside `mapInPandas` — demonstrates the 1→N batch shape
  (video → frames, audio → windows) with bounded memory per batch.
- **resize** (`resize_media`): payload → smaller payload (image
  thumbnail / audio downsample shape). The decode→interpolate→encode
  middle is the stubbed part (no codec libs here); the deterministic
  stand-in keeps every ``ratio``-th byte, so output size, content
  hash, and the binary-in/binary-out Arrow plumbing are all real and
  value-tested.

At 100 TB: payloads dominate bytes, so all three operators are
map-only over the scan partitioning — no shuffle. Feature extraction
cost scales with executor Python workers; `spark.sql.execution.arrow.
maxRecordsPerBatch` bounds per-batch memory when payloads are large.
Real deployments read payloads via ``spark.read.format("binaryFile")``
(used by the compaction tiny-file path, operators/compaction.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

#: magic prefixes for payload sniffing (hex, uppercase)
MAGIC_PREFIXES = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "494433": "audio/mp3",
    "52494646": "audio/wav",  # RIFF
}


def decode_media(media_type: str):  # pragma: no cover - stub by design
    """STUB: real media decode (PIL / librosa / pyav) is unavailable in
    this environment. The Spark plumbing around it is real; swap this
    for an actual decoder in production."""
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires image/audio libraries "
        "not present in this environment; use the deterministic "
        "byte-statistics featurizer for pipeline testing"
    )


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns from an opaque binary payload (JVM-only)."""
    p = F.col(payload_col)
    sniff = F.lit("application/octet-stream")
    for prefix, mtype in MAGIC_PREFIXES.items():
        nbytes = len(prefix) // 2
        sniff = F.when(
            F.upper(F.hex(F.substring(p, 1, nbytes))) == prefix, F.lit(mtype)
        ).otherwise(sniff)
    return (
        df.withColumn("n_bytes", F.length(p).cast("bigint"))
        .withColumn("payload_sha256", F.sha2(p, 256))
        .withColumn("sniffed_type", sniff)
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("feat_mean", DoubleType()),
    ]
)


def extract_features(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic byte-statistics features via mapInPandas.

    Stands in for decode→embed: FEATURE_DIM bucketed byte means over
    the payload. Arrow-batched (vectorized numpy inside), no shuffle,
    output partitioning == input partitioning.
    """
    import numpy as np
    import pandas as pd

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = len(arr)
                chunks = np.array_split(arr, FEATURE_DIM)
                feats = [float(c.mean()) if len(c) else 0.0 for c in chunks]
                # byte_sum is an exact integer: the oracle-checkable
                # witness that the Arrow plumbing saw every byte
                rows.append((int(mid), n, int(arr.sum()), feats, float(np.mean(feats))))
            yield pd.DataFrame(rows, columns=[f.name for f in _FEATURE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(featurize, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_payload", BinaryType()),
        StructField("resized_sha256", StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    ratio: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Binary-in/binary-out downsample via mapInPandas (resize shape).

    Production swaps the strided-byte stand-in for decode → resample →
    re-encode (`decode_media`); the Spark contract — opaque binary
    column out, ~1/ratio the bytes, deterministic content hash, output
    partitioning == input partitioning, no shuffle — is identical.
    """
    import hashlib

    import pandas as pd

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                out = bytes(payload[::ratio])
                rows.append(
                    (
                        int(mid),
                        len(payload),
                        len(out),
                        out,
                        hashlib.sha256(out).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(resize, _RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha256", StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 4096,
    stride: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """1→N fan-out: split each payload into fixed-size "frames" and keep
    every ``stride``-th one (video frame-sampling shape, stubbed on
    bytes). Row explosion happens inside the Arrow batch, so memory is
    bounded by batch size × frame count, not the whole partition.
    """
    import hashlib

    import pandas as pd

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = max(1, (len(payload) + frame_size - 1) // frame_size)
                for i in range(0, n_frames, stride):
                    chunk = payload[i * frame_size : (i + 1) * frame_size]
                    rows.append(
                        (int(mid), i, len(chunk), hashlib.sha256(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(frames, _FRAME_SCHEMA)
