"""Q16/Q17 — the reference's own core operation as declared queries.

Q16: explode the ``events`` table into many small JSON files, compact
them with the engine (O1 scan → O4 whole-file read → O8 size-targeted
bundles → O13 delivery → O15 audit), read the bundles back, and return
the full row set. The oracle is simply ``SELECT * FROM events`` — the
round trip must preserve the exact row multiset.

Q17: the ordered file manifest (total (mtime, path) order — SURVEY
§7.3.3's declared upgrade over the reference's approximate order).
Non-SQL-expressible (DuckDB can't list a temp directory), so it is a
rows-only check.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.compaction import (
    JSON_TS_OPTIONS,
    CompactionConfig,
    compact,
    read_bundles,
)
from lakeflush_spark.operators.manifest import ordered_manifest
from lakeflush_spark.plans.queries import declare

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _explode_to_small_files(spark: SparkSession, sf_dir: str, workdir: str, n_files: int) -> str:
    """Materialize events as many small NDJSON files (the reference's
    input shape: tests/lakes/random_datalake.py builds such lakes)."""
    lake = os.path.join(workdir, "lake")
    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    writer = ev.repartition(n_files).write.mode("overwrite")
    for k, v in JSON_TS_OPTIONS.items():
        writer = writer.option(k, v)
    writer.json(lake)
    return lake


@declare(
    "q16_compaction_roundtrip",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events",
    "Explode events to ~200 small JSON files, compact to size-targeted "
    "bundles, read bundles back: row multiset must equal the source table.",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    workdir = tempfile.mkdtemp(prefix="lakeflush_q16_")
    lake = _explode_to_small_files(spark, sf_dir, workdir, n_files=200)
    dest = os.path.join(workdir, "compacted")
    compact(
        spark,
        CompactionConfig(source_dir=lake, dest_dir=dest, file_format="json", max_size_mb=4.0),
    )
    return read_bundles(spark, dest, fmt="json", schema=ev.schema).select(*_EVENT_COLS)


@declare(
    "q17_manifest_order",
    None,  # rows-only: the oracle can't list engine-local temp dirs
    "Total-order (mtime, path) file manifest over a small-file lake.",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    workdir = tempfile.mkdtemp(prefix="lakeflush_q17_")
    lake = _explode_to_small_files(spark, sf_dir, workdir, n_files=50)
    return ordered_manifest(spark, lake).select(
        F.col("file_path"), F.col("mtime"), F.col("size")
    )
