"""Versioned KV metastore — the reference's ``SQLiteMetastore`` surface
(`lakeflush/utils/metastore.py:7-174`; dead code there — never imported
— but part of the declared surface, SURVEY §1.4/O17) rebuilt as a
Parquet-backed, Spark-queryable table.

Design: an append-only log of (key, value, version, tombstone, ts)
parquet rows; reads resolve the latest live version with a window.
Compared to the sqlite original:

- same operations: set (optional versioning, metastore.py:54-66), get
  (+timestamps), version history, LIKE search (:130-150), delete,
  list, clear;
- additionally QUERYABLE from any executor/session via
  ``as_dataframe()`` — it is a normal parquet table;
- writes are driver-side appends (metadata volume, not data volume);
  single-writer semantics like sqlite. ``compact()`` folds the log.

At 100 TB the metastore stays tiny (pipeline config, schema versions,
watermark bookmarks) — the design constraint is read ubiquity, not
write throughput.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("value", StringType(), True),
        StructField("version", LongType(), False),
        StructField("tombstone", BooleanType(), False),
        StructField("updated_at", DoubleType(), False),
    ]
)


class ParquetMetastore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- internals ---------------------------------------------------------

    def _log(self) -> DataFrame:
        try:
            return self.spark.read.schema(_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], _SCHEMA)

    def _append(self, rows: list[tuple]) -> None:
        # one-slice local frame (io.local_rows_df): a plain
        # createDataFrame().coalesce(1) evaluates defaultParallelism
        # pickled slices serially through python workers — a measured
        # ~5 s tax PER PUT on local[32]
        from lakeflush_spark.io import local_rows_df

        local_rows_df(self.spark, rows, _SCHEMA).write.mode("append").parquet(
            self.path
        )

    def _latest(self) -> DataFrame:
        """One row per key: highest version, tombstones filtered."""
        w = Window.partitionBy("key").orderBy(F.desc("version"), F.desc("updated_at"))
        return (
            self._log()
            .withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (~F.col("tombstone")))
            .drop("_rn")
        )

    def _max_version(self, key: str) -> int:
        row = self._log().where(F.col("key") == key).agg(F.max("version")).collect()[0]
        return int(row[0]) if row[0] is not None else 0

    # -- reference surface (utils/metastore.py) ----------------------------

    def set(self, key: str, value: str, versioned: bool = True) -> int:
        """Append a new version (reference: set_metadata, :54-66).

        ``versioned=False`` still appends (the log is immutable) but
        re-uses the current version number — history folds away on
        ``compact()``, matching the reference's overwrite semantics.
        """
        if not key:
            raise ValueError("key is required")
        cur = self._max_version(key)
        version = cur + 1 if (versioned or cur == 0) else cur
        self._append([(key, value, version, False, time.time())])
        return version

    def get(self, key: str) -> str | None:
        rows = self._latest().where(F.col("key") == key).select("value").collect()
        return rows[0][0] if rows else None

    def get_with_timestamps(self, key: str):
        """(value, created_at, updated_at) like the reference's
        get_metadata include_timestamps path (:96-109)."""
        log = self._log().where((F.col("key") == key) & (~F.col("tombstone")))
        agg = log.agg(
            F.min("updated_at").alias("created"), F.max("updated_at").alias("updated")
        ).collect()[0]
        value = self.get(key)
        if value is None:
            return None
        return value, float(agg["created"]), float(agg["updated"])

    def versions(self, key: str) -> list[tuple[int, str]]:
        """Full version history, oldest first (reference :111-128)."""
        rows = (
            self._log()
            .where((F.col("key") == key) & (~F.col("tombstone")))
            .orderBy("version", "updated_at")
            .select("version", "value")
            .collect()
        )
        return [(int(r["version"]), r["value"]) for r in rows]

    def search(self, pattern: str, in_values: bool = False) -> dict[str, str]:
        """SQL-LIKE search over keys (or values) — reference :130-150."""
        col = F.col("value") if in_values else F.col("key")
        rows = self._latest().where(col.like(pattern)).select("key", "value").collect()
        return {r["key"]: r["value"] for r in rows}

    def delete(self, key: str) -> None:
        """Tombstone append (reference delete_metadata, :152-160)."""
        self._append([(key, None, self._max_version(key) + 1, True, time.time())])

    def keys(self) -> list[str]:
        return sorted(r["key"] for r in self._latest().select("key").collect())

    def clear(self) -> None:
        """Tombstone every live key (reference clear_metadata, :168-174)."""
        now = time.time()
        live = self._latest().select("key", "version").collect()
        if live:
            self._append([(r["key"], None, int(r["version"]) + 1, True, now) for r in live])

    # -- extensions --------------------------------------------------------

    def as_dataframe(self) -> DataFrame:
        """Latest live KV pairs as a queryable DataFrame."""
        return self._latest().select("key", "value", "version", "updated_at")

    def compact(self) -> None:
        """Fold the log to latest-live rows (overwrite in place)."""
        latest = self._latest().collect()
        rows = [
            (r["key"], r["value"], int(r["version"]), False, float(r["updated_at"]))
            for r in latest
        ]
        from lakeflush_spark.io import local_rows_df

        # one-slice local frame: createDataFrame().coalesce(1) would
        # evaluate defaultParallelism pickled slices serially through
        # python workers (io.local_rows_df note)
        df = local_rows_df(self.spark, rows, _SCHEMA)
        df.write.mode("overwrite").parquet(self.path)
