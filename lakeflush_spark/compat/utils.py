"""Drop-in twins of the reference's utility classes (SURVEY §2.D).

Reference surfaces (all three are dead code there — never imported by
the engine — but part of the published package, so import parity
matters for drop-in users):

- ``SQLiteMetastore``   utils/metastore.py:7-174  — KV metadata store
  with optional version history, LIKE search, timestamps.
- ``MetaDataStore``     utils/metadata/store.py:5-23 — class-level
  counters keyed by ``MetaDataKey`` (utils/metadata/key.py:4-7).
- ``Logger``            utils/logger.py:1-44 — classmethod facade over
  a stdout stdlib logger.

These are clean reimplementations, not copies: the metastore is an
adapter over the Spark-queryable :class:`~lakeflush_spark.metastore.
ParquetMetastore` (append-only parquet log instead of a sqlite file —
readable from any executor or engine), and the counter store delegates
to the LIVE :class:`~lakeflush_spark.metrics.PipelineMetrics` (the
reference never increments its counters anywhere).
"""

from __future__ import annotations

import json
import logging
import sys
from enum import Enum
from typing import Any

from lakeflush_spark.metrics import PipelineMetrics


class MetaDataKey(str, Enum):
    """Counter names — reference utils/metadata/key.py:4-7.

    ``str`` mixin (not StrEnum) so the same class imports on every
    Python the engine supports; values compare equal to the reference's.
    """

    COLLECTED = "collected"
    FLUSHED = "flushed"
    ERRORED = "errored"

    __str__ = str.__str__  # StrEnum behavior: str(key) == key.value


class MetaDataStore:
    """Class-level counter store — reference utils/metadata/store.py:5-23.

    Same surface (``setup`` / ``set`` / ``get``), but backed by a
    :class:`PipelineMetrics` so counters observed by the Spark metrics
    plumbing (``observe_collected``, ``StreamMetricsListener``) and
    counters read through this compat class are the SAME numbers.
    """

    _metrics = PipelineMetrics()
    _extra: dict = {}

    @classmethod
    def setup(cls) -> None:
        cls._metrics = PipelineMetrics()
        cls._extra = {}

    @classmethod
    def metrics(cls) -> PipelineMetrics:
        """The live backing counters (extension point, not in reference)."""
        return cls._metrics

    @classmethod
    def set(cls, key: "MetaDataKey | str", value: Any) -> None:
        attr = str(key)
        if attr in ("collected", "flushed", "errored"):
            setattr(cls._metrics, attr, value)
        else:
            cls._extra[attr] = value

    @classmethod
    def get(cls, key: "MetaDataKey | str") -> Any:
        attr = str(key)
        if attr in ("collected", "flushed", "errored"):
            return getattr(cls._metrics, attr)
        return cls._extra.get(attr)


class Logger:
    """Classmethod logging facade — reference utils/logger.py:1-44.

    Identical observable format (``ts | LEVEL | name | msg`` on
    stdout); implementation defers handler setup so importing the
    class never touches global logging state.
    """

    _logger: logging.Logger | None = None

    @classmethod
    def setup(cls, name: str = "lakeflush", level: int = logging.INFO) -> None:
        lg = logging.getLogger(name)
        lg.setLevel(level)
        lg.handlers.clear()  # idempotent re-setup, like the reference
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(
                fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
                datefmt="%Y-%m-%d %H:%M:%S",
            )
        )
        lg.addHandler(handler)
        cls._logger = lg
        cls.info("setup logger")

    @classmethod
    def _get(cls) -> logging.Logger:
        if cls._logger is None:
            cls.setup()
        return cls._logger  # type: ignore[return-value]

    @classmethod
    def info(cls, msg: str):
        return cls._get().info(msg)

    @classmethod
    def error(cls, msg: str):
        return cls._get().error(msg)

    @classmethod
    def warning(cls, msg: str):
        return cls._get().warning(msg)


class SQLiteMetastore:
    """Reference-signature KV metastore (utils/metastore.py:7-174).

    Adapter over :class:`lakeflush_spark.metastore.ParquetMetastore`:
    ``db_path`` names a parquet DIRECTORY (append-only version log)
    instead of a sqlite file, which makes the store queryable from any
    Spark session or external engine — everything else matches the
    reference surface: JSON round-tripping of non-string values,
    optional per-key version history, timestamps, LIKE search over
    values, delete / list / clear.
    """

    def __init__(self, db_path: str = "metastore.db", spark=None):
        from lakeflush_spark.metastore import ParquetMetastore

        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is None:
            from lakeflush_spark.session import get_spark

            spark = get_spark(app_name="lakeflush-compat-metastore")
        self._store = ParquetMetastore(spark, str(db_path))

    # -- value codec (reference :45-47, :81-86) -----------------------------

    @staticmethod
    def _encode(value: Any) -> str:
        return value if isinstance(value, str) else json.dumps(value)

    @staticmethod
    def _decode(raw: str | None) -> Any:
        if raw is None:
            return None
        try:
            return json.loads(raw)
        except (json.JSONDecodeError, TypeError):
            return raw

    # -- reference surface ---------------------------------------------------

    def set_metadata(self, key: str, value: Any, versioned: bool = False) -> None:
        self._store.set(key, self._encode(value), versioned=versioned)

    def get_metadata(self, key: str, default: Any | None = None) -> Any:
        raw = self._store.get(key)
        return default if raw is None else self._decode(raw)

    def get_metadata_with_timestamps(self, key: str) -> dict[str, Any] | None:
        got = self._store.get_with_timestamps(key)
        if got is None:
            return None
        value, created, updated = got
        return {
            "key": key,
            "value": self._decode(value),
            "created_at": created,
            "updated_at": updated,
        }

    def get_metadata_versions(self, key: str) -> list[dict[str, Any]]:
        """Superseded values only, newest first (reference :111-128:
        history holds the values archived at overwrite time, never the
        current one; unversioned overwrites leave no history)."""
        all_versions = self._store.versions(key)
        if not all_versions:
            return []
        latest = max(v for v, _ in all_versions)
        return [
            {"value": self._decode(raw), "created_at": None}
            for v, raw in reversed(all_versions)
            if v < latest
        ]

    def search_metadata(self, search_term: str | None = None) -> dict[str, Any]:
        pattern = f"%{search_term}%" if search_term else "%"
        found = self._store.search(pattern, in_values=True)
        return {k: self._decode(v) for k, v in found.items()}

    def delete_metadata(self, key: str) -> None:
        self._store.delete(key)

    def list_keys(self) -> list[str]:
        return self._store.keys()

    def clear(self) -> None:
        self._store.clear()
