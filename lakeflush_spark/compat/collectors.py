"""Drop-in lake collectors with the reference's API, Spark underneath.

``LocalLakeCollector`` / ``S3LakeCollector`` keep the reference's
constructor signatures (collectors/local_lake.py:29-58,
collectors/s3_lake.py:33-67) and its output contract — rotated bundles
named ``<filename>.<ts>.<uuid32>.lakeflush.collected[.gz]`` appearing
in ``filepath`` for a Flusher to deliver — but ``start()`` runs ONE
Spark job (:func:`lakeflush_spark.operators.compaction.compact`)
instead of the reference's single-threaded per-record Python loop
(collectors/local_lake.py:60-72). Differences, all documented:

- The whole batch is compacted, so the tail bundle is finalized to
  ``.collected`` instead of left ``.inprogress`` (the reference
  strands the tail until the time interval next trips at emit time).
- ``batch_size`` is accepted for signature parity but unused — Spark's
  scan planning replaces the bounded-heap listing (O18;
  utils/file/processor.py:109-111).
- Record order inside bundles is not the reference's approximate-mtime
  order (SURVEY §3.4 documents the reference's own order as
  approximate); multiset content is identical.
- ``csv_header=True`` maps to parsed CSV with an all-string schema
  taken from the first file's header line: per-file headers are
  stripped and each bundle carries exactly one header (the header
  lock, utils/file/reader/csv.py:14-21). Fields with embedded
  delimiters are re-quoted canonically on write.

The per-record ``collect()`` API inherited from
:class:`lakeflush_spark.compat.core.Collector` still works on these
classes — small trickles use it; bulk ingest uses ``start()``.
"""

from __future__ import annotations

import os
import uuid

from lakeflush_spark.compat.core import Collector
from lakeflush_spark.compat.files import FileType

_TYPE_TO_FORMAT = {FileType.JSON: "json", FileType.CSV: "csv", FileType.TEXT: "text"}


def _string_schema_from_header(spark, source_dir: str, patterns: list[str]):
    """All-string StructType from the first source file's header line —
    keeps csv_header mode schema-free like the reference (values pass
    through as raw strings, no type inference rewriting them)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from lakeflush_spark.operators.compaction import (
        CompactionConfig,
        _first_source_file,
        _sample_source_head,
    )

    cfg = CompactionConfig(source_dir=source_dir, dest_dir="", match_patterns=patterns)
    first = _first_source_file(spark, cfg)
    if first is None:
        return None
    head = _sample_source_head(spark, first, max_bytes=65536)
    header_line = head.split(b"\n", 1)[0].decode("utf-8").rstrip("\r")
    cols = [c.strip().strip('"') for c in header_line.split(",")]
    return StructType([StructField(c, StringType()) for c in cols])


class _SparkLakeCollector(Collector):
    """Shared Spark-backed bulk ingest for local and S3 lakes."""

    def __init__(
        self,
        source_uri: str,
        file_type: str = FileType.JSON,
        match_patterns: list[str] | None = None,
        batch_size: int = 1000,
        csv_header: bool = False,
        log_file: bool = False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.source_uri = source_uri
        self.file_type = file_type
        self.match_patterns = list(match_patterns or [])
        self.batch_size = batch_size  # parity only; see module docstring
        self.csv_header = csv_header
        self.log_file = log_file
        self._spark = None

    def _get_spark(self):
        if self._spark is None:
            from lakeflush_spark.session import get_spark

            self._spark = get_spark(app_name="lakeflush-compat-collector")
        return self._spark

    def start(self) -> list[str]:
        """Compact the whole source lake into ``.collected`` bundles in
        ``filepath``. Returns the list of collected bundle paths.

        One Spark job: list+read the lake, write size-targeted bundles
        into a hidden staging dir under ``filepath``, then rename each
        part-file to the reference's collected-bundle name (a pure
        metadata op — one rename per >=max_size_mb bundle)."""
        from lakeflush_spark.compat.s3 import download_prefix, is_s3_uri, s3a_available
        from lakeflush_spark.operators.compaction import CompactionConfig, compact

        spark = self._get_spark()
        self.close()  # release the per-record in-progress stream
        staging = os.path.join(self.path, f".lakeflush-staging-{uuid.uuid4().hex}")
        fmt = _TYPE_TO_FORMAT.get(self.file_type, "json")

        import shutil

        source_uri = self.source_uri
        object_staging = None
        # Both staging dirs are removed in the finally block: a failed
        # run (corrupt object, disk-full, schema error) must not leak a
        # full lake copy per retry under the collector dir.
        try:
            if is_s3_uri(source_uri) and not s3a_available(spark):
                # No hadoop-aws on the JVM classpath: stage the objects
                # with boto3 (the reference's own S3 client) and compact
                # the local staging dir. With hadoop-aws present this
                # branch is dead and the scan stays remote (zero staged
                # bytes).
                object_staging = os.path.join(
                    self.path, f".lakeflush-s3-staging-{uuid.uuid4().hex}"
                )
                download_prefix(source_uri, object_staging)
                source_uri = object_staging

            schema = None
            parsed = False
            if fmt == "csv" and self.csv_header:
                schema = _string_schema_from_header(spark, source_uri, self.match_patterns)
                parsed = schema is not None

            cfg = CompactionConfig(
                source_dir=source_uri,
                dest_dir=staging,
                file_format=fmt,
                match_patterns=self.match_patterns,
                max_size_mb=self.max_bytes / (1024 * 1024),
                compress=self.compress,
                parsed=parsed,
                schema=schema,
                csv_header=self.csv_header,
            )
            result = compact(spark, cfg)

            collected: list[str] = []
            for bundle in result.bundles:
                local = bundle.removeprefix("file:")
                if not os.path.getsize(local):
                    continue
                dest = self.lakeflush_namer()
                os.replace(local, dest)
                collected.append(dest)
                self.on_collected()
            # staging now holds only committer droppings + the audit
            # table; keep the audit (it is the queryable flush history)
            # by moving it next to the bundles.
            audit_src = os.path.join(staging, "_lakeflush_audit")
            if os.path.isdir(audit_src):
                audit_dest = os.path.join(self.path, "_lakeflush_audit")
                os.makedirs(audit_dest, exist_ok=True)
                for f in os.listdir(audit_src):
                    shutil.move(os.path.join(audit_src, f), os.path.join(audit_dest, f))
            return collected
        finally:
            shutil.rmtree(staging, ignore_errors=True)
            if object_staging:
                shutil.rmtree(object_staging, ignore_errors=True)


class LocalLakeCollector(_SparkLakeCollector):
    """Collects all files in a local lake into large bundles
    (reference collectors/local_lake.py:9-82).

    Args:
        root_dir: Root of the source lake.
        file_type: 'json' | 'csv' | 'text' (default 'json').
        match_patterns: Unix-style filename patterns, e.g. ["*.json"].
        batch_size: Accepted for parity; unused (Spark plans the scan).
        csv_header: CSV header-lock mode (one header per bundle).
        log_file: Accepted for parity; unused.
        **kwargs: Collector args (filepath, filename, max_size_mb,
            max_time_mins, compress).

    Example:
        >>> c = LocalLakeCollector(root_dir, filepath=fp, filename=fn)
        >>> c.start()
    """

    def __init__(
        self,
        root_dir: str,
        file_type: str = FileType.JSON,
        match_patterns: list[str] | None = None,
        batch_size: int = 1000,
        csv_header: bool = False,
        log_file: bool = False,
        **kwargs,
    ):
        if not root_dir:
            raise ValueError("root_dir is required.")
        if not os.path.exists(root_dir):
            raise ValueError(f"Directory does not exist: {root_dir}")
        if not os.path.isdir(root_dir):
            raise ValueError(f"Path is not a directory: {root_dir}")
        super().__init__(
            source_uri=root_dir,
            file_type=file_type,
            match_patterns=match_patterns,
            batch_size=batch_size,
            csv_header=csv_header,
            log_file=log_file,
            **kwargs,
        )


class S3LakeCollector(_SparkLakeCollector):
    """Collects all objects in an S3 lake into large local bundles
    (reference collectors/s3_lake.py:11-100).

    The bucket is addressed through Hadoop's FileSystem API: a bare
    bucket name becomes ``s3a://bucket`` (requires hadoop-aws on the
    cluster classpath); any full URI (``s3a://…``, ``file://…``,
    ``hdfs://…``) is used as-is, which keeps the class testable
    without network access.

    Args:
        bucket: S3 bucket name or full FS URI.
        prefix: Key prefix under the bucket (default root).
        s3_batchsize: Accepted for parity; unused (s3a lists in pages
            internally — reference utils/s3/processor.py:35-40).
        file_type / match_patterns / batch_size / csv_header /
        log_file / **kwargs: as LocalLakeCollector.
    """

    def __init__(
        self,
        bucket: str,
        prefix: str | None = None,
        s3_batchsize: int = 1000,
        file_type: str = FileType.JSON,
        match_patterns: list[str] | None = None,
        batch_size: int = 1000,
        csv_header: bool = False,
        log_file: bool = False,
        **kwargs,
    ):
        if not bucket:
            raise ValueError("s3 bucket name is required.")
        uri = bucket if "://" in bucket else f"s3a://{bucket}"
        if prefix:
            uri = f"{uri.rstrip('/')}/{prefix.strip('/')}"
        self.s3_batchsize = s3_batchsize  # parity only
        super().__init__(
            source_uri=uri,
            file_type=file_type,
            match_patterns=match_patterns,
            batch_size=batch_size,
            csv_header=csv_header,
            log_file=log_file,
            **kwargs,
        )
