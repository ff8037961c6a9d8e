"""boto3 S3 transport for the compat lake collectors/flushers.

The reference's S3 classes are boto3-native (collectors/s3_lake.py:
33-67 builds a ``boto3.client("s3")``; flushers/s3_lake.py:28-70
uploads with it). The Spark engine's preferred S3 path is Hadoop's
``s3a://`` FileSystem — zero-copy scans on a cluster — but that needs
``hadoop-aws`` on the JVM classpath, which plain-Python deployments
(and this offline container) lack. This module supplies the boto3
twin:

- :func:`upload_file` — direct reference-parity delivery; used by
  ``S3LakeFlusher`` for every ``s3://``-family URI (boto3 resolves
  credentials exactly like the reference did).
- :func:`download_prefix` — object staging for ``S3LakeCollector``
  when the JVM cannot mount ``s3a://`` (classpath probe via
  :func:`s3a_available`); the compaction job then runs over the local
  staging dir. On a cluster WITH hadoop-aws the collector keeps the
  scan remote and no bytes are staged.

Everything degrades with actionable errors when boto3 itself is
missing. Tested against a moto-mocked S3 endpoint
(tests/test_s3_compat.py) — the same contract the reference's own
suite exercises.
"""

from __future__ import annotations

import os


def _boto3():
    try:
        import boto3  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "S3 access without hadoop-aws requires boto3 "
            "(pip install boto3), the reference's own S3 client"
        ) from exc
    return boto3


def parse_s3_uri(uri: str) -> tuple[str, str]:
    """``s3[an]?://bucket/prefix`` -> (bucket, prefix-without-slashes)."""
    rest = uri.split("://", 1)[1]
    bucket, _, prefix = rest.partition("/")
    return bucket, prefix.strip("/")


def is_s3_uri(uri: str) -> bool:
    return uri.startswith(("s3://", "s3a://", "s3n://"))


def s3a_available(spark) -> bool:
    """True when the JVM classpath carries hadoop-aws's S3AFileSystem."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem")
        return True
    except Exception:  # noqa: BLE001 - Py4J raises wrapped JVM errors
        return False


def download_prefix(uri: str, dest_dir: str) -> int:
    """Stage every object under ``uri`` into ``dest_dir``, preserving
    the key structure below the prefix (same tree the s3a directory
    listing would expose — basename flattening would silently collide
    same-named objects from different sub-prefixes). Paged GET loop
    like the reference (utils/s3/processor.py lists with
    list_objects_v2). Returns the object count."""
    bucket, prefix = parse_s3_uri(uri)
    client = _boto3().client("s3")
    os.makedirs(dest_dir, exist_ok=True)
    # "lake" must list the lake/ DIRECTORY, not every key string-
    # prefixed by "lake" (which would also match lake2/...)
    list_prefix = f"{prefix}/" if prefix else ""
    n = 0
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=list_prefix):
        for obj in page.get("Contents", []):
            key = obj["Key"]
            if key.endswith("/"):  # folder marker
                continue
            rel = key[len(list_prefix):]
            local = os.path.join(dest_dir, *rel.split("/"))
            os.makedirs(os.path.dirname(local), exist_ok=True)
            client.download_file(bucket, key, local)
            n += 1
    return n


def upload_file(local_path: str, dest_uri: str) -> None:
    """PUT one local file at ``dest_uri`` (overwrite semantics, like
    the reference's S3Store.upload)."""
    bucket, key = parse_s3_uri(dest_uri)
    _boto3().client("s3").upload_file(local_path, bucket, key)
