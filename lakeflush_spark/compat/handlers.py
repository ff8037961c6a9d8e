"""Rotating-file and rotation-event handlers of the reference API.

The reference wires its Collector to ``logging``-based rotating file
handlers (core/file_handler.py:5-66, core/gzipfile_handler.py:6-117)
and reacts to rotation renames through a watchdog event handler
(core/event_handler.py:4-15). The Spark compat Collector
(``compat.core``) implements rotation itself — these classes exist so
code importing the reference's handler types keeps working, and they
are real, usable handlers (stdlib-only; watchdog is not required).

Behavioral notes vs the reference (same surface, independent
implementation):

- ``SizedTimedRotatingFileHandler`` rotates when EITHER the byte cap
  or the ``when``/``interval`` clock fires, and invokes
  ``rotation_callback`` after each rollover.
- ``GzipSizedTimedRotatingFileHandler`` writes gzip-compressed bytes
  as it goes and checks the on-disk compressed size at most every
  100 KiB of writes (the reference's own sampling trick,
  gzipfile_handler.py:52) because exact compressed size is unknowable
  per record.
- ``FileRotationEventHandler`` is watchdog-*compatible* (duck-typed
  ``dispatch``/``on_moved``), not watchdog-*dependent*: pass it to a
  watchdog observer if that package is installed, or drive it from
  any event object with ``event_type``/``dest_path`` attributes (the
  compat Flusher's inotify watcher does).
"""

from __future__ import annotations

import gzip
import os
from logging.handlers import TimedRotatingFileHandler

#: how many written bytes may pass between on-disk size checks of the
#: gzip handler (compressed size is only known post-flush)
GZIP_SIZE_CHECK_BYTES = 100 * 1024


class SizedTimedRotatingFileHandler(TimedRotatingFileHandler):
    """Time-based rotation (inherited) plus a byte cap: the file rolls
    when appending the next record would reach ``maxBytes``
    (``maxBytes=0`` disables the size check). Reference parity:
    core/file_handler.py:5-66."""

    def __init__(
        self,
        filename,
        maxBytes: int = 1024 * 1024,
        backupCount: int = 1,
        when: str = "M",
        interval: int = 1,
        rotation_callback=None,
        **kwargs,
    ):
        super().__init__(
            filename, when=when, interval=interval, backupCount=backupCount
        )
        self.max_bytes = int(maxBytes)
        self.rotation_callback = rotation_callback

    def shouldRollover(self, record) -> bool:
        if self.max_bytes > 0 and self.stream is not None:
            pending = len(f"{self.format(record)}\n")
            self.stream.seek(0, os.SEEK_END)
            if self.stream.tell() + pending >= self.max_bytes:
                return True
        return bool(super().shouldRollover(record))

    def doRollover(self) -> None:
        super().doRollover()
        if self.rotation_callback:
            self.rotation_callback()


class GzipSizedTimedRotatingFileHandler(TimedRotatingFileHandler):
    """Size+time rotation writing gzip-compressed output directly.
    Reference parity: core/gzipfile_handler.py:6-117. The size check
    samples the on-disk compressed size every
    ``GZIP_SIZE_CHECK_BYTES`` of written payload."""

    def __init__(
        self,
        filename,
        maxBytes: int = 1024 * 1024,
        backupCount: int = 1,
        when: str = "M",
        interval: int = 1,
        compresslevel: int = 6,
        rotation_callback=None,
        **kwargs,
    ):
        if not str(filename).endswith(".gz"):
            filename = f"{filename}.gz"
        super().__init__(
            filename,
            when=when,
            interval=interval,
            backupCount=backupCount,
            encoding="utf-8",
            delay=True,
        )
        self.max_bytes = int(maxBytes)
        self.compresslevel = int(compresslevel)
        self.rotation_callback = rotation_callback
        self._written_since_check = 0
        self._open_gzip()

    def _open_gzip(self) -> None:
        if self.stream:
            self.stream.close()
        self.stream = gzip.open(
            self.baseFilename, mode="ab", compresslevel=self.compresslevel
        )
        self._written_since_check = 0

    def shouldRollover(self, record) -> bool:
        if (
            self.max_bytes > 0
            and self._written_since_check >= GZIP_SIZE_CHECK_BYTES
        ):
            self._written_since_check = 0
            if os.path.getsize(self.baseFilename) >= self.max_bytes:
                return True
        return bool(super().shouldRollover(record))

    def emit(self, record) -> None:
        try:
            payload = (self.format(record) + self.terminator).encode(
                self.encoding or "utf-8"
            )
            self.stream.write(payload)
            self.stream.flush()
            self._written_since_check += len(payload)
            if self.shouldRollover(record):
                self.doRollover()
        except Exception:  # noqa: BLE001 — logging contract: never raise
            self.handleError(record)

    def doRollover(self) -> None:
        if self.stream:
            self.stream.close()
            self.stream = None
        super().doRollover()
        self._open_gzip()
        if self.rotation_callback:
            self.rotation_callback()

    def close(self) -> None:
        if self.stream:
            self.stream.flush()
            self.stream.close()
            self.stream = None
        super().close()


class FileRotationEventHandler:
    """Reacts to a rotation RENAME whose destination contains
    ``keyword`` by calling :meth:`on_collected` — subclass and
    implement it. Reference parity: core/event_handler.py:4-15
    (there a watchdog ``FileSystemEventHandler`` subclass; here a
    dependency-free duck-type with the same dispatch surface)."""

    def __init__(self, keyword: str):
        self.keyword = keyword

    def dispatch(self, event) -> None:
        """watchdog-style routing: ``event.event_type`` selects the
        ``on_<type>`` method when present."""
        handler = getattr(self, f"on_{getattr(event, 'event_type', '')}", None)
        if handler is not None:
            handler(event)

    def on_moved(self, event) -> None:
        dest = getattr(event, "dest_path", "") or ""
        if self.keyword in str(dest):
            self.on_collected(dest)

    def on_collected(self, dest_path) -> None:
        raise NotImplementedError(
            "subclass FileRotationEventHandler and implement on_collected"
        )
