"""File-layout vocabulary of the reference API, re-exposed for compat.

Mirrors the reference's public surface (not its implementation):

- ``FileStatus``  — utils/file/status.py:4-7
- ``FileType``    — utils/file/type.py:4-6
- ``FileStore``   — utils/file/store.py:5-46

``StrEnum`` is avoided (reference requires py3.11 for it) — plain
``str``-valued class attributes keep the same comparison/format
behavior on any supported Python.
"""

from __future__ import annotations

import os
from pathlib import Path


class FileStatus:
    """Bundle lifecycle suffixes (reference utils/file/status.py:4-7)."""

    INPROGRESS = ".inprogress"
    COLLECTED = ".collected"
    FLUSHED = ".flushed"


class FileType:
    """Source formats (reference utils/file/type.py:4-6), plus TEXT —
    claimed by the reference README (README.md:16) but never realized
    as a reader there; here it is a real opaque-line mode."""

    JSON = "json"
    CSV = "csv"
    TEXT = "text"


class FileStore:
    """Filesystem helpers with the reference's surface
    (utils/file/store.py:5-46): meta dir setup, flush sidecars,
    lakeflush filename formatting."""

    _lakeflush_path: Path | None = None

    @classmethod
    def setup(cls, path: str = ".") -> None:
        cls._lakeflush_path = Path(os.path.realpath(path)) / ".lakeflush"
        os.makedirs(cls._lakeflush_path, mode=0o700, exist_ok=True)

    @classmethod
    def flushmeta(cls, meta_filename: str, dest_filepath: str) -> None:
        """Sidecar audit file: ``<bundle>.lakeflush.flushed`` containing
        the destination path (reference utils/file/store.py:16-21).
        The Spark engine's queryable audit table
        (operators/compaction.py::_write_audit) is the scale path;
        this sidecar is kept for drop-in behavioral parity."""
        if cls._lakeflush_path is None:
            cls.setup()
        with open(cls._lakeflush_path / meta_filename, "w") as fp:
            fp.write(str(dest_filepath))

    @classmethod
    def format(cls, path: str, name: str, status: str) -> str:
        return f"{os.path.realpath(path)}/{name}.lakeflush{status}"

    @classmethod
    def basename(cls, filepath: str) -> str:
        return os.path.basename(str(filepath))

    @classmethod
    def exists(cls, path) -> bool:
        return os.path.exists(str(path))

    @classmethod
    def mkdirs(cls, path) -> None:
        os.makedirs(str(path), exist_ok=True)

    @classmethod
    def empty(cls, path) -> bool:
        return os.path.getsize(str(path)) == 0


class FileProcessor:
    """Recursive scan of a directory tree yielding files oldest-first
    by modification time, with optional filename glob filters —
    reference parity: utils/file/processor.py:9-120.

    Independent implementation with a deliberately STRONGER ordering
    guarantee: one stat-only walk collects ``(mtime, path)`` tuples
    (tens of bytes per file), then a single heap drains them in total
    ``(mtime, path)`` order. The reference's incremental heap only
    orders within ~``batch_size`` windows; total order is what its
    callers actually assume (compaction replays bundles in arrival
    order), so this is parity with the intent. ``batch_size`` is
    accepted for signature compatibility and does not change the
    ordering. Unreadable directories/files are skipped, as there.

    This is the plain-Python side; the distributed twin is
    ``operators/manifest.scan_manifest`` (mtime order as a Spark
    window over the Hadoop file listing), which is the path that
    scales past one node.
    """

    def __init__(self, root_dir, match_patterns=(), batch_size: int = 1000):
        self.root = Path(root_dir)
        self.match_patterns = tuple(match_patterns)
        self.batch_size = int(batch_size)
        self._ordered = None

    def _matches(self, name: str) -> bool:
        import fnmatch

        return not self.match_patterns or any(
            fnmatch.fnmatch(name, p) for p in self.match_patterns
        )

    def _scan(self):
        import heapq

        entries = []
        for dirpath, _dirnames, filenames in os.walk(self.root):
            for name in filenames:
                if not self._matches(name):
                    continue
                full = os.path.join(dirpath, name)
                try:
                    entries.append((os.stat(full).st_mtime, full))
                except OSError:
                    continue  # vanished or unreadable: skip, like there
        heapq.heapify(entries)
        while entries:
            _, path = heapq.heappop(entries)
            yield Path(path)

    def __iter__(self):
        self._ordered = self._scan()
        return self

    def __next__(self) -> Path:
        if self._ordered is None:
            self._ordered = self._scan()
        return next(self._ordered)


class CSVFileReader:
    """Chunked CSV bundle reader with one-header semantics across a
    file SEQUENCE — reference parity: utils/file/reader/csv.py:4-34.
    The first read of a header-ful sequence yields the header line
    once and remembers it; every later file's first line is dropped
    (that is operator O6, header dedup). Body lines stream out in
    ``batch_size``-line chunks joined verbatim (no CPU-relax sleep —
    scheduling belongs to the engine)."""

    def __init__(self, header: bool, batch_size: int = 100) -> None:
        self.header = bool(header)
        self.header_data = None
        self.batch_size = int(batch_size)

    def read(self, file_path):
        with open(file_path, "r") as fh:
            if self.header:
                first = fh.readline()
                # falsy check, not `is None` (reference parity): an
                # EMPTY first file must not capture '' as the header —
                # the next file's real header would then be silently
                # consumed as already-seen and never yielded.
                # Documented divergence (ADVICE r13): a WHITESPACE-ONLY
                # first line with data rows after it is intentionally
                # discarded (its slot stays open for the next file's
                # first line); the reference would store/yield the
                # empty string instead. Pathological input — we prefer
                # never emitting a blank header over byte parity here.
                if not self.header_data and first.strip():
                    self.header_data = first.strip()
                    yield self.header_data
            chunk = []
            for line in fh:
                chunk.append(line)
                if len(chunk) >= self.batch_size:
                    yield "".join(chunk).strip()
                    chunk = []
            if chunk:
                yield "".join(chunk).strip()


class JSONFileReader:
    """Whole-file JSON bundle reader — reference parity:
    utils/file/reader/json.py:1-12. Yields the file's full content
    once when non-empty; ``header_data`` exists (always None) because
    the collector's reader handling checks it uniformly."""

    def __init__(self) -> None:
        self.header_data = None

    def read(self, file_path):
        with open(file_path, "r") as fh:
            content = fh.read()
        if content:
            yield content
