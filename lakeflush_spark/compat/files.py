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
