"""Drop-in lake flushers with the reference's API.

``LocalLakeFlusher`` / ``S3LakeFlusher`` keep the reference's
constructor signatures and delivery contract
(flushers/local_lake.py:10-69, flushers/s3_lake.py:10-75):

- destination name = bundle name with ``.collected`` removed;
- optional processing-time partition path from
  ``datetime.now().strftime(date_partition_format)``;
- a ``.lakeflush.flushed`` sidecar written per delivered bundle
  (FileStore.flushmeta) — the Spark engine additionally keeps a
  queryable parquet audit table for bulk runs.

Deltas (documented improvements, SURVEY §3.4):

- inotify events (ctypes binding, no deps) + a periodic catch-up
  sweep, instead of events only: sub-second reaction like the
  reference's watchdog watcher (core/flusher.py:51-57), AND bundles
  that pre-date the flusher are delivered (the reference never
  flushes them, core/flusher.py:48-67);
- failed flushes are retried on the next sweep (the reference logs
  and strands the bundle, flushers/local_lake.py:68-69).

``S3LakeFlusher`` uploads through Hadoop's FileSystem API so the same
code serves ``s3a://`` buckets on a cluster and ``file://`` roots in
tests; the source bundle is left on local disk after upload, exactly
like the reference (flushers/s3_lake.py:62 uploads without deleting).
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime
from pathlib import Path

from lakeflush_spark.compat.core import Flusher
from lakeflush_spark.compat.files import FileStatus, FileStore


class LocalLakeFlusher(Flusher):
    """Flushes collected bundles to a local destination root
    (reference flushers/local_lake.py:10-69). Existing destination
    files are overwritten.

    Args:
        root_dir: Destination root (lake) to flush bundles into.
        filepath: The same path given to the collector.
        filename: The same name given to the collector.
        date_partition_format: Optional strftime partition pattern,
            e.g. ``"year=%Y/month=%m/day=%d"``.
    """

    def __init__(
        self,
        root_dir: str,
        filepath: str,
        filename: str,
        date_partition_format: str | None = None,
    ):
        super().__init__(filepath, filename)
        if not root_dir:
            raise ValueError("root_dir is required.")
        self.root = Path(root_dir)
        if not FileStore.exists(self.root):
            raise ValueError("root_dir provided does not exist.")
        self.partition_format = date_partition_format

    def flush(self, src_file: str) -> None:
        basename = FileStore.basename(src_file)
        destname = basename.replace(FileStatus.COLLECTED, "")
        flush_path = self.root / destname
        if self.partition_format:
            partition_path = datetime.now().strftime(self.partition_format)
            flush_path = self.root / partition_path
            FileStore.mkdirs(flush_path)
            flush_path = flush_path / destname
        shutil.move(src_file, flush_path)
        metaname = basename.replace(FileStatus.COLLECTED, FileStatus.FLUSHED)
        FileStore.flushmeta(metaname, flush_path)


class S3LakeFlusher(Flusher):
    """Flushes collected bundles to an S3 bucket/prefix
    (reference flushers/s3_lake.py:10-75). Existing objects are
    overwritten.

    Args:
        bucket: Destination bucket name or full FS URI (``s3a://…``;
            ``file://…`` works for offline tests).
        filepath: The same path given to the collector.
        filename: The same name given to the collector.
        prefix: Key prefix under the bucket (default root).
        date_partition_format: Optional strftime partition pattern.
    """

    def __init__(
        self,
        bucket: str,
        filepath: str,
        filename: str,
        prefix: str | None = None,
        date_partition_format: str | None = None,
    ):
        super().__init__(filepath, filename)
        if not bucket:
            raise ValueError("bucket is required.")
        uri = bucket if "://" in bucket else f"s3a://{bucket}"
        if prefix:
            uri = f"{uri.rstrip('/')}/{prefix.strip('/')}"
        self.dest_uri = uri.rstrip("/")
        self.partition_format = date_partition_format
        self._spark = None
        self._s3a_probe: bool | None = None

    def _fs_and_path(self, uri: str):
        """``(jvm, fs, path)`` via the shared Connect-safe bridge
        (io.hadoop_fs, the r6 guard pattern), or ``None`` when the
        session has no ``_jvm`` — callers degrade to boto3 / plain IO."""
        if self._spark is None:
            from lakeflush_spark.session import get_spark

            self._spark = get_spark(app_name="lakeflush-compat-flusher")
        from lakeflush_spark.io import hadoop_fs

        return hadoop_fs(self._spark, uri)

    def _s3a_usable(self) -> bool:
        # Cached classpath probe: clusters configure S3 credentials /
        # endpoints via Hadoop (fs.s3a.*), so when hadoop-aws is present
        # the JVM path MUST stay the delivery route; boto3 is the
        # jar-less fallback only.
        if self._s3a_probe is None:
            from lakeflush_spark.compat.s3 import s3a_available

            if self._spark is None:
                from lakeflush_spark.session import get_spark

                self._spark = get_spark(app_name="lakeflush-compat-flusher")
            self._s3a_probe = s3a_available(self._spark)
        return self._s3a_probe

    def flush(self, src_file: str) -> None:
        from lakeflush_spark.compat.s3 import is_s3_uri, upload_file

        basename = FileStore.basename(src_file)
        object_key = basename.replace(FileStatus.COLLECTED, "")
        flush_prefix = ""
        if self.partition_format:
            flush_prefix = datetime.now().strftime(self.partition_format) + "/"
        dest = f"{self.dest_uri}/{flush_prefix}{object_key}"
        bridge = None
        if not (is_s3_uri(dest) and not self._s3a_usable()):
            bridge = self._fs_and_path(dest)
        if bridge is not None:
            jvm, fs, dest_path = bridge
            src_path = jvm.org.apache.hadoop.fs.Path(
                "file://" + os.path.abspath(src_file)
            )
            # delSrc=False (bundle stays local, like the reference
            # upload), overwrite=True (S3Store.upload overwrites).
            fs.copyFromLocalFile(False, True, src_path, dest_path)
        elif is_s3_uri(dest):
            # boto3 delivery — the reference's own S3 upload path
            # (flushers/s3_lake.py:62, overwrite semantics) — used when
            # the JVM cannot mount s3a:// (no hadoop-aws on classpath)
            # or the session has no py4j bridge (Spark Connect).
            upload_file(os.path.abspath(src_file), dest)
        else:
            # Connect session + non-S3 destination: deliver with plain
            # IO when the URI is local, else there is no route — raise
            # actionably rather than die on a private-API attribute.
            from lakeflush_spark.io import local_path

            lp = local_path(dest)
            if lp is None:
                raise RuntimeError(
                    f"cannot deliver {dest!r}: this session has no JVM "
                    "filesystem bridge (Spark Connect) and the URI is "
                    "neither S3 (boto3 route) nor local (plain IO route)"
                )
            os.makedirs(os.path.dirname(lp), exist_ok=True)
            shutil.copyfile(os.path.abspath(src_file), lp)
        metaname = basename.replace(FileStatus.COLLECTED, FileStatus.FLUSHED)
        FileStore.flushmeta(metaname, f"{flush_prefix}{object_key}")
