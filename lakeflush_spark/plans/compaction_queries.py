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


# Deterministic fixture lake at a FIXED path so the oracle SQL can list
# the same directory with DuckDB's read_text (filename/size/
# last_modified). mtimes are md5-derived pseudo-random whole seconds —
# mtime order is DECOUPLED from name order, so the hash check actually
# proves the manifest sorts by (mtime, path), not accidentally by name.
# The fixture is byte-identical on every run (plain-Python writes,
# fixed names/content/mtimes): re-runs and stale leftovers converge.
_Q17_LAKE = "/tmp/lakeflush_q17_lake"
_Q17_BASE_S = 1_600_000_000
_Q17_N_FILES = 50


def _build_q17_lake() -> None:
    import hashlib
    import shutil

    os.makedirs(_Q17_LAKE, exist_ok=True)
    expected = {f"doc_{i:04d}.json" for i in range(_Q17_N_FILES)}
    for f in os.listdir(_Q17_LAKE):
        if f not in expected:
            p = os.path.join(_Q17_LAKE, f)
            # stray dirs (e.g. /tmp squatting) must not wedge the build
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    for i in range(_Q17_N_FILES):
        name = f"doc_{i:04d}.json"
        p = os.path.join(_Q17_LAKE, name)
        body = "".join('{"k": %d, "file": %d}\n' % (j, i) for j in range(i + 1))
        with open(p, "w") as fh:
            fh.write(body)
        mt = _Q17_BASE_S + int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % 86400
        os.utime(p, (mt, mt))


@declare(
    "q17_manifest_order",
    f"""
    SELECT regexp_extract(filename, '[^/]+$') AS file_name,
           epoch(last_modified)::BIGINT AS mtime_s,
           size::BIGINT AS size,
           CAST(row_number() OVER (ORDER BY last_modified, filename) AS BIGINT) AS pos
    FROM read_text('{_Q17_LAKE}/*.json')
    ORDER BY pos
    """,
    "Total-order (mtime, path) file manifest over a small-file lake, "
    "value-checked against an independent directory listing — the pos "
    "column pins the ORDER itself, not just the row set. "
    "(r2: upgraded from rows-only to full hash check.)",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _build_q17_lake()
    # global window is fine HERE: the frame is file METADATA (one row
    # per file, ~100 bytes), not data — even a 100 TB lake of 16 MB
    # bundles is ~6.5M manifest rows, a single-task sort of <1 GB. A
    # billion-file manifest would switch to operators/topk.
    # global_row_number with an mtime-bucket shard.
    w = Window.orderBy("mtime", "file_path")
    return (
        ordered_manifest(spark, _Q17_LAKE, ["*.json"])
        .select(
            F.element_at(F.split("file_path", "/"), -1).alias("file_name"),
            F.unix_timestamp("mtime").cast("bigint").alias("mtime_s"),
            F.col("size").cast("bigint").alias("size"),
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
        .orderBy("pos")
    )
