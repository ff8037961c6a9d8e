"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` in one JVM; the conf below is written
for a real multi-executor cluster at ~100 TB: AQE on (runtime
coalescing, skew-join splitting), broadcast threshold sized for
dimension tables, shuffle partitions sized for the local box but
overridable via env for cluster deploys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lakeflush_spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Honours ``SPARK_GRAFT_CPUS`` for local parallelism. At cluster
    scale, ``spark.sql.shuffle.partitions`` is left to AQE coalescing
    from an intentionally high initial number — the knob that matters
    at 100 TB is ``advisoryPartitionSizeInBytes``, not a fixed count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # local[N] runs driver AND all N executor threads in ONE JVM whose
    # default heap is 1 GiB — at 32 threads the allocation rate of
    # expression-heavy stages turns into multi-second full-GC pauses
    # (measured: same sf0.1 query 1.1s-8.5s run-to-run at 1g, stable
    # at a real heap). On a cluster this maps to executor memory, set
    # by the deploy; here it must be set before the JVM launches.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    # r14: commit and PRE-FAULT the whole heap at JVM launch
    # (-Xms=driver_mem + AlwaysPreTouch). On this box the host's
    # anonymous-page-fault service rate intermittently collapses
    # (~40 µs+/page, measured via scripts/box_probe.py); a JVM that
    # grows its heap lazily then stalls for seconds mid-query the
    # first time each GC region is touched — the bench's recurring
    # first-pass 3-20 s outliers. Pre-touching moves that cost to
    # startup (untimed warmup) and is standard practice for
    # latency-sensitive JVMs; override via SPARK_GRAFT_DRIVER_JAVA_OPTS
    # (e.g. "" to disable). -Xmx stays owned by spark.driver.memory.
    #
    # r15 (VERDICT r14 #2): the pre-touch default is SCOPED to the
    # bench/serving posture — it costs ~30 s + a full driver_mem commit
    # per JVM launch, which is right when the timed region must be
    # immune to first-touch faulting (bench.py / qtime set
    # SPARK_GRAFT_BENCH=1) and wrong as a tax on every test session.
    # Explicit SPARK_GRAFT_PRETOUCH=1/0 overrides the marker either way;
    # SPARK_GRAFT_DRIVER_JAVA_OPTS overrides everything.
    pretouch = os.environ.get("SPARK_GRAFT_PRETOUCH")
    if pretouch is None:
        pretouch = "1" if os.environ.get("SPARK_GRAFT_BENCH") else "0"
    driver_jopts = os.environ.get(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        f"-Xms{driver_mem} -XX:+AlwaysPreTouch" if pretouch == "1" else "",
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", driver_mem)
        # --- Adaptive Query Execution: the scale levers -------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        # --- Shuffle / broadcast ------------------------------------
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- Scans --------------------------------------------------
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # --- Python interop: Arrow everywhere -----------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r14 (guide §4, the driver-side Python boundary): PySpark 4's
        # DataFrame-debugging wrapper decorates EVERY DataFrame/Column
        # API call with call-site capture for richer error messages —
        # measured ~4 extra py4j round trips per call (getActiveSession
        # + conf.get + PySparkCurrentOrigin.set/clear) ≈ 2 s of the
        # label-suite builders' driver-side assembly (q60 profile:
        # 2.4 s cumulative in errors/utils wrapper out of ~3.5 s
        # assembly). Pure observability; results are unchanged.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # --- Object-store (s3a://) readiness ------------------------
        # Consulted only when a path actually uses the s3a scheme, so
        # harmless on boxes without hadoop-aws on the classpath. Every
        # engine path resolves its FileSystem per-URI
        # (Path.getFileSystem), so file:/hdfs:/s3a: all share one code
        # path. The magic committer gives task-commit atomicity on S3
        # without a rename (renames are O(data) copies on object
        # stores); fast.upload streams multipart puts instead of
        # buffering whole part-files on local disk.
        .config("spark.hadoop.fs.s3a.committer.name", "magic")
        .config("spark.hadoop.fs.s3a.committer.magic.enabled", "true")
        .config(
            "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a",
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
        )
        .config("spark.hadoop.fs.s3a.fast.upload", "true")
        .config("spark.hadoop.fs.s3a.connection.maximum", "128")
        .config("spark.hadoop.fs.s3a.block.size", "128M")
        .config("spark.hadoop.fs.s3a.directory.marker.retention", "keep")
        # --- Determinism for oracle comparison ----------------------
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if driver_jopts.strip():
        builder = builder.config(
            "spark.driver.extraJavaOptions", driver_jopts
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
