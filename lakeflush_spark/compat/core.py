"""Drop-in ``Collector`` / ``Flusher`` with the reference's API.

These are the reference's two public core classes
(core/collector.py:11-103, core/flusher.py:8-71) re-implemented
cleanly:

- The reference's data plane is Python's ``logging`` framework (a
  rotated ``TimedRotatingFileHandler`` — collector.py:56-80), which
  silently drops ALL data if the host app calls
  ``logging.disable(logging.INFO)``. Here ``collect()`` writes
  directly to the bundle stream — same rotation contract, no logging
  coupling.
- The reference's flusher needs a watchdog inotify observer and never
  flushes bundles that already exist at startup (core/flusher.py:48-67
  has no startup scan). Here the flusher polls with a startup scan, so
  pre-existing ``.collected`` bundles ARE delivered — a documented
  strict improvement; failed flushes are retried on the next poll
  instead of stranding the bundle (reference logs and gives up,
  flushers/local_lake.py:68-69).

Rotation contract preserved exactly:

- uncompressed: PRE-write size check — a bundle never exceeds
  ``max_size_mb`` (core/file_handler.py:52-57);
- gzip: POST-write check of the on-disk *compressed* size, re-checked
  every >=100 KB of uncompressed writes — bundles may slightly
  overshoot (core/gzipfile_handler.py:52,66-69);
- time rotation is evaluated at emit time only — an idle collector
  does not rotate (core/file_handler.py:58-59);
- rotated name: ``<name>.<unix-ts>.<uuid32>.lakeflush.collected[.gz]``
  (core/collector.py:82-91).

These classes are the single-process compat surface. The scale path
for bulk ingest is :func:`lakeflush_spark.operators.compaction.compact`
(one Spark job); ``LocalLakeCollector.start()`` delegates to it.
"""

from __future__ import annotations

import gzip
import os
import threading
import time
import uuid

from lakeflush_spark.compat.files import FileStatus, FileStore

_GZIP_CHECK_BYTES = 100 * 1024  # reference gzipfile_handler.py:52


class Collector:
    """Collects records into a rolling bundle file, rotating on size
    and time (reference core/collector.py:11-103).

    Args:
        filepath: Directory the in-progress/collected bundles live in.
        filename: Bundle base name.
        max_size_mb: Rotation size cap in MB (default 1).
        max_time_mins: Rotation interval in minutes (default 1).
        compress: Gzip the bundles (default False).

    Example:
        >>> collector = Collector(filepath, filename)
        >>> collector.collect(data)
    """

    def __init__(
        self,
        filepath: str,
        filename: str,
        max_size_mb: int = 1,
        max_time_mins: int = 1,
        compress: bool = False,
    ):
        # Validation matrix mirrors core/collector.py:35-45.
        if not filepath or not filename:
            raise ValueError("filepath and filename is required.")
        if not FileStore.exists(filepath):
            raise ValueError("filepath provided does not exists.")
        if max_size_mb < 1:
            raise ValueError("max_size_mb cannot be less than 1.")
        if max_time_mins < 1:
            raise ValueError("max_time_mins cannot be less than 1.")

        FileStore.setup()
        self.path = filepath
        self.name = filename
        self.compress = compress
        self.max_bytes = int(max_size_mb) * 1024 * 1024
        self.interval_s = int(max_time_mins) * 60

        self._lock = threading.RLock()
        self._stream = None
        self._size = 0  # uncompressed bytes written to current bundle
        self._unchecked = 0  # gzip mode: bytes since last on-disk check
        self._opened_at = 0.0
        self._open_stream()

    # -- naming ------------------------------------------------------

    @property
    def inprogress_path(self) -> str:
        p = FileStore.format(self.path, self.name, FileStatus.INPROGRESS)
        return f"{p}.gz" if self.compress else p

    def lakeflush_namer(self) -> str:
        """``<name>.<unix-ts>.<uuid32>.lakeflush.collected[.gz]``
        (reference core/collector.py:82-91)."""
        base = f"{self.name}.{int(time.time())}.{uuid.uuid4().hex}"
        file_path = FileStore.format(self.path, base, FileStatus.COLLECTED)
        return f"{file_path}.gz" if self.compress else file_path

    # -- stream lifecycle --------------------------------------------

    def _open_stream(self) -> None:
        if self.compress:
            self._stream = gzip.open(self.inprogress_path, "ab", compresslevel=6)
        else:
            self._stream = open(self.inprogress_path, "ab")
        self._size = os.path.getsize(self.inprogress_path) if not self.compress else 0
        self._unchecked = 0
        self._opened_at = time.time()

    def _should_rollover_pre(self, record_len: int) -> bool:
        if time.time() - self._opened_at >= self.interval_s:
            return True
        if self.compress:
            return False  # gzip checks post-write against compressed size
        return self._size + record_len >= self.max_bytes

    def _should_rollover_post(self) -> bool:
        if not self.compress or self._unchecked < _GZIP_CHECK_BYTES:
            return False
        self._stream.flush()
        self._unchecked = 0
        return os.path.getsize(self.inprogress_path) >= self.max_bytes

    def rotate(self) -> str | None:
        """Finalize the current bundle (rename to ``.collected``) and
        open a fresh one. Returns the collected path, or None if the
        bundle was empty. Public so batch ingest can finalize the tail
        bundle instead of leaving it in-progress forever."""
        with self._lock:
            self._stream.close()
            src = self.inprogress_path
            if os.path.getsize(src) == 0:
                self._open_stream()
                return None
            dest = self.lakeflush_namer()
            os.replace(src, dest)
            self._open_stream()
            self.on_collected()
            return dest

    def close(self) -> None:
        with self._lock:
            if self._stream is not None:
                self._stream.close()
                self._stream = None

    # -- hot path ----------------------------------------------------

    def collect(self, data: str) -> None:
        """Append one record (``data + "\\n"``) to the in-progress
        bundle, rotating first/after per the size-time contract."""
        record = data.encode("utf-8") + b"\n"
        with self._lock:
            if self._should_rollover_pre(len(record)):
                self.rotate()
            self._stream.write(record)
            self._size += len(record)
            self._unchecked += len(record)
            if self._should_rollover_post():
                self.rotate()

    def on_collected(self) -> None:
        """Callback after rotation opens a fresh bundle
        (reference core/collector.py:93-95)."""


class Flusher:
    """Delivers ``.collected`` bundles to a destination in near-real
    time (reference core/flusher.py:8-71).

    Subclasses implement :meth:`flush`. ``start()`` blocks, polling the
    collector directory; ``stop()`` (from another thread) ends it.

    Example:
        >>> flusher = LocalLakeFlusher(root_dir, filepath, filename)
        >>> flusher.start()
    """

    def __init__(self, filepath: str, filename: str):
        # Validation mirrors core/flusher.py:23-27.
        if not filepath or not filename:
            raise ValueError("filepath and filename is required.")
        if not FileStore.exists(filepath):
            raise ValueError("filepath provided does not exists.")
        FileStore.setup()
        self.path = filepath
        self.name = filename
        self.keyword = ".lakeflush" + FileStatus.COLLECTED
        self._running = False
        # Bundles already delivered whose source file remains on disk
        # (S3-style upload leaves the local bundle, flushers/s3_lake.py:62);
        # without this a polling flusher would re-upload every cycle.
        self._delivered: set[str] = set()

    def on_collected(self, dest_path) -> None:
        """Flush one detected bundle, skipping empty files (O12,
        reference core/flusher.py:37-42)."""
        dest_path = str(dest_path)
        if not FileStore.empty(dest_path):
            self.flush(dest_path)

    def flush(self, collected_filepath: str) -> None:
        raise NotImplementedError

    def poll_once(self) -> int:
        """One scan of the collector dir; flushes every ``.collected``
        bundle found. Returns the number of bundles flushed. Unlike the
        reference's event-only watcher, this picks up bundles that
        pre-date the flusher, and a bundle whose flush raised is
        retried on the next poll (strict improvements, SURVEY §3.4)."""
        flushed = 0
        try:
            entries = sorted(os.scandir(self.path), key=lambda e: e.name)
        except FileNotFoundError:
            return 0
        for entry in entries:
            if not (entry.is_file() and self.keyword in entry.name):
                continue
            if entry.path in self._delivered:
                continue
            try:
                self.on_collected(entry.path)
            except Exception:
                continue  # retried next poll
            self._delivered.add(entry.path)
            flushed += 1
        return flushed

    def start(self, poll_interval: float = 1.0, use_events: bool = True) -> None:
        """Blocking delivery loop (reference core/flusher.py:48-67).

        With ``use_events`` (default) the loop blocks on a Linux
        inotify watch of the collector dir and reacts to new bundles
        with sub-second latency — the reference's watchdog/inotify
        behavior (core/flusher.py:51-57) — while still sweeping every
        ``poll_interval`` seconds as the retry/catch-up path (events
        can be dropped under overflow; failed flushes retry on the
        sweep). Falls back to plain polling where inotify is
        unavailable (non-Linux)."""
        self._running = True
        watcher = _INotifyWatcher.create(self.path) if use_events else None
        try:
            while self._running:
                self.poll_once()
                if watcher is not None:
                    watcher.wait(poll_interval)
                else:
                    time.sleep(poll_interval)
        except KeyboardInterrupt:
            pass
        finally:
            if watcher is not None:
                watcher.close()
            self._running = False

    def stop(self) -> None:
        self._running = False


class _INotifyWatcher:
    """Minimal Linux inotify binding (ctypes, zero dependencies).

    Restores the reference's event-driven flush trigger
    (core/flusher.py:51-57 uses the watchdog package) without adding a
    package the engine's environment may not carry. Watches for
    IN_CLOSE_WRITE|IN_MOVED_TO — the two ways a finished bundle
    appears (written in place, or renamed from a staging name, which
    is how the compat collector commits bundles)."""

    IN_CLOSE_WRITE = 0x00000008
    IN_MOVED_TO = 0x00000080
    IN_NONBLOCK = os.O_NONBLOCK  # same value on Linux

    def __init__(self, fd: int):
        self.fd = fd

    @classmethod
    def create(cls, path: str) -> "_INotifyWatcher | None":
        """Return a watcher on ``path``, or None when inotify is
        unavailable (non-Linux, or exhausted watch descriptors)."""
        try:
            import ctypes
            import ctypes.util

            libc = ctypes.CDLL(
                ctypes.util.find_library("c") or "libc.so.6", use_errno=True
            )
            fd = libc.inotify_init1(cls.IN_NONBLOCK)
            if fd < 0:
                return None
            wd = libc.inotify_add_watch(
                fd, os.fsencode(path), cls.IN_CLOSE_WRITE | cls.IN_MOVED_TO
            )
            if wd < 0:
                os.close(fd)
                return None
            return cls(fd)
        except Exception:  # noqa: BLE001 - fall back to polling
            return None

    def wait(self, timeout: float) -> bool:
        """Block until a filesystem event or ``timeout``; drains the
        event queue (the caller rescans the dir, so event payloads are
        not parsed). Returns True when an event arrived."""
        import select

        ready, _, _ = select.select([self.fd], [], [], timeout)
        if not ready:
            return False
        try:
            os.read(self.fd, 65536)
        except BlockingIOError:
            pass
        return True

    def close(self) -> None:
        try:
            os.close(self.fd)
        except OSError:
            pass
