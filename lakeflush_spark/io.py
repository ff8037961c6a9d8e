"""Table loading for the driver testdata star schema.

Tables live as single parquet files per scale factor
(``/root/testdata/sf*/<name>.parquet``). At 100 TB each table would be
a partitioned/bucketed parquet (or Delta/Iceberg) root — the loader
only changes its path argument; every downstream operator stays the
same because access goes through the DataFrame reader (partition
discovery, predicate pushdown and column pruning are free).
"""

from __future__ import annotations

import os
import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# TPC-H fixes nation=25 / region=5 rows independent of SF, so a
# broadcast hint on these is safe even at 100 TB.
ALWAYS_BROADCAST = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Tolerate nanosecond parquet timestamps in any session (the driver
    # builds its own SparkSession, so set this defensively per read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    return _fixup(spark, name, df)


def _fixup(spark: SparkSession, name: str, df: DataFrame) -> DataFrame:
    """Normalize testdata quirks at the source boundary.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's
    parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as
    raw int64 (``spark.sql.legacy.parquet.nanosAsLong``) and convert
    ns → µs → TIMESTAMP_NTZ right at the scan, so every downstream
    operator sees a regular timestamp column. The conversion is a
    codegen'd projection — no extra pass over the data.
    """
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread_for_compute(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Ensure a compute-bound map stage uses the whole cluster.

    Parquet scans parallelize by ROW GROUP: a table written as one file
    with one row group (the testdata layout) becomes a single task, and
    an expression-heavy projection (minhash, simhash, fingerprints)
    then runs on one core no matter how many are available. Repartition
    ONLY when the scan is under-parallelized — at real scale the scan
    already has >= defaultParallelism splits and this is the identity,
    so no 100 TB shuffle is ever introduced; at bench scale the shuffle
    moves a few MB to unlock an N-core compute stage.
    """
    try:
        target = spark.sparkContext.defaultParallelism
        n_parts = df.rdd.getNumPartitions()
    except (AttributeError, NotImplementedError):
        # Spark Connect exposes neither sparkContext nor df.rdd
        # (PySparkAttributeError / PySparkNotImplementedError subclass
        # these); skip the under-parallelized-scan fixup there (AQE's
        # coalesce and the scan's own split sizing still apply). Other
        # errors — real analysis/connection failures — propagate.
        return df
    if n_parts < target:
        return df.repartition(target)
    return df


def hadoop_fs(spark: SparkSession, path_str: str):
    """``(jvm, fs, path)`` via the py4j Hadoop FileSystem bridge, or
    ``None`` when that private surface is unavailable (Spark Connect
    sessions have no ``_jvm``). Callers must degrade to a
    metadata-only DataFrame job (``scan_manifest``) or plain Python IO
    for ``file:`` paths — never assume the bridge exists (r6 guard;
    the q52 ``_jdf → inputFiles → count`` chain is the same pattern).
    """
    try:
        jvm, jsc = spark._jvm, spark._jsc
        if jvm is None or jsc is None:
            return None
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        return jvm, p.getFileSystem(jsc.hadoopConfiguration()), p
    except Exception:
        return None


def local_path(path_str: str) -> str | None:
    """Local-filesystem form of ``path_str`` (scheme-less or ``file:``),
    else ``None`` — the test for "can plain Python IO touch this"."""
    import re

    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):", path_str)
    if m is None:
        return path_str
    if m.group(1).lower() != "file":
        return None
    rest = path_str[m.end():]
    if rest.startswith("//"):
        rest = rest[2:]
        if not rest.startswith("/"):
            return None  # non-empty authority: not this machine
    return rest or "/"


#: shared long-lived pool for overlapping independent eager Spark jobs
#: (guide §2.6 — checkpoint builds, store writes). MODULE-LEVEL on
#: purpose: in py4j pinned-thread mode every Python thread owns a
#: dedicated JVM thread that outlives it unless explicitly cleaned
#: (pyspark.InheritableThread's reason to exist) — a per-call pool
#: leaks JVM threads at every use and measurably degrades a long
#: bench run (the q55 pool note, r14).
_EAGER_POOL: list = []
#: creation guard (r15, ADVICE r14): two threads — e.g. two concurrent
#: foreachBatch streams — could both see the empty list and build two
#: executors; the loser's pool (and its py4j-pinned JVM threads) leaks.
_EAGER_POOL_LOCK = threading.Lock()


def eager_pool():
    """The shared eager-job pool (8 workers: enough to overlap every
    independent job a caller submits, few enough that FIFO scheduling
    keeps the first job's stages at full width)."""
    if not _EAGER_POOL:
        from concurrent.futures import ThreadPoolExecutor

        with _EAGER_POOL_LOCK:
            if not _EAGER_POOL:
                _EAGER_POOL.append(
                    ThreadPoolExecutor(
                        max_workers=8, thread_name_prefix="eager-pool"
                    )
                )
    return _EAGER_POOL[0]


def local_rows_df(
    spark: SparkSession, rows: list, schema, slices: int = 1
) -> DataFrame:
    """``createDataFrame`` for small DRIVER-SIDE row lists, pre-sized
    to ``slices`` partitions (default ONE).

    ``SparkSession.createDataFrame(list)`` chops even a one-row list
    into ``defaultParallelism`` pickled slices; any later
    ``coalesce(1)`` — or any single-task consumer — then evaluates
    every slice SERIALLY through its own Python-worker round-trip
    (~160 ms each; measured ~5 s per call on a local[32] session —
    this was the curation stream's per-batch stats-write tax and the
    metastore's per-put tax). An explicit one-slice ``parallelize``
    makes the local frame ONE python partition: one round-trip, one
    output file, and ``coalesce(1)`` downstream is a no-op.

    Falls back to plain ``createDataFrame`` where no SparkContext is
    exposed (Spark Connect).
    """
    try:
        sc = spark.sparkContext
    except Exception:  # Spark Connect: no local RDD path
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(sc.parallelize(rows, max(1, slices)), schema)
