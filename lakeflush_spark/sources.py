"""External source connectors (SURVEY §2.B scans row).

parquet / orc / json / csv / text / binaryFile ship inside Spark and
are used throughout the engine.

**JDBC is fully functional here**: the JDBC datasource is core Spark,
and Spark bundles Apache Derby's embedded driver (for the Hive
metastore), so :func:`read_jdbc`/:func:`write_jdbc` round-trip for
REAL against ``jdbc:derby:`` databases in this offline container —
including the partitioned parallel read
(partitionColumn/lowerBound/upperBound/numPartitions), the shape that
matters at scale (``tests/test_sources.py``). Against
Postgres/MySQL/etc. the identical code path needs only that
database's driver jar (``--jars``).

**Avro works for REAL here too (r6)**: the spark-avro connector jar
is preferred when present, and without it :func:`read_avro` degrades
to :func:`read_avro_python` — a pure-Python Avro Object Container
codec (``operators/avro_codec.py``, spec-implemented, cross-validated
in both directions against the JVM Avro library Spark bundles) on
``binaryFile`` + ``mapInPandas`` rails; :func:`write_avro_python`
writes one container file per partition to POSIX-visible paths. On a
cluster, prefer the connector:

- **Avro**: ``--packages org.apache.spark:spark-avro_2.13:<spark-ver>``

Kafka is a BROKER, not a file format — there is nothing to implement
without one, so the stream source stays jar-gated with an actionable
error instead of Spark's raw ClassNotFound chain:

- **Kafka**: ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``

Each builder returns the fully-configured DataFrame/reader so cluster
code paths are identical to local ones; only jar availability differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_AVRO_HINT = (
    "Avro support requires the spark-avro package on the classpath: "
    "spark-submit --packages org.apache.spark:spark-avro_2.13:<spark-version>"
)
_KAFKA_HINT = (
    "Kafka support requires the spark-sql-kafka package on the classpath: "
    "spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
)
_JDBC_HINT = (
    "JDBC reads require the database driver jar on driver+executor "
    "classpaths (spark.jars / --jars), e.g. postgresql-<ver>.jar"
)


class MissingConnectorError(RuntimeError):
    """A source needs a jar that is not on this deployment's classpath."""


def _wrap(fn, hint: str):
    try:
        return fn()
    except Exception as ex:  # AnalysisException DATA_SOURCE_NOT_FOUND / ClassNotFound
        msg = str(ex)
        if any(s in msg for s in ("DATA_SOURCE_NOT_FOUND", "ClassNotFound", "Failed to find")):
            raise MissingConnectorError(f"{hint}\n(underlying: {msg.splitlines()[0]})") from ex
        raise


def read_avro(
    spark: SparkSession,
    path: str,
    schema=None,
    fallback: bool = True,
    glob: str | None = None,
    skip_corrupt: bool = False,
) -> DataFrame:
    """Batch-read Avro files (columnar-compatible: compactable to
    parquet/orc via ``CompactionConfig(output_format=...)``).

    Prefers the spark-avro connector (C-speed, predicate pushdown);
    when its jar is absent and ``fallback=True`` (default), degrades
    to :func:`read_avro_python` — the pure-Python container codec on
    ``binaryFile`` + ``mapInPandas`` rails (r6), so Avro reads work
    for REAL even without deploy-time jars."""

    def go():
        reader = spark.read.format("avro").option("recursiveFileLookup", "true")
        if glob is not None:
            reader = reader.option("pathGlobFilter", glob)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.load(path)
        df.schema  # force source resolution so the error surfaces here
        return df

    try:
        return _wrap(go, _AVRO_HINT)
    except MissingConnectorError:
        if not fallback:
            raise
        return read_avro_python(
            spark, path, schema, glob=glob, skip_corrupt=skip_corrupt
        )


def read_avro_python(
    spark: SparkSession,
    path: str,
    schema=None,
    glob: str | None = None,
    skip_corrupt: bool = False,
) -> DataFrame:
    """Library-free Avro batch read (r6): ``binaryFile`` whole-file
    scan + Arrow-batched ``mapInPandas`` running the pure-Python
    container codec (``operators/avro_codec.py``, spec-implemented and
    cross-validated against the JVM Avro library in tests).

    Whole-FILE decode is the task unit — the tiny-file compaction
    shape: linear in bytes, parallel across files, no shuffle. The
    Spark schema comes from the first file's embedded writer schema
    (one bounded driver-side read) unless ``schema`` (DDL string or
    StructType) is given; every file's records map into that schema's
    columns BY NAME, so files whose writer schemas order the same
    fields differently (schema evolution, mixed writers) decode
    correctly rather than positionally transposed, and fields a file
    lacks come back NULL. ``glob`` filters file names (the
    connector's ``pathGlobFilter``); by default ALL visible files are
    read, like the connector — a non-Avro or corrupt file raises
    naming its path, and ``skip_corrupt=True`` (compaction's
    ignore_corrupt_files semantics) skips such files instead. Prefer
    the connector where its jar exists; this path is the no-jar
    fallback, not a column-pruning reader."""
    import pandas as pd  # noqa: F401 (executor-side import check)

    from lakeflush_spark.operators.avro_codec import (
        avro_type_to_spark,
        read_container,
    )

    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    if schema is None:
        first = files.limit(1).head()
        if first is None:
            raise ValueError(f"no files under {path} to infer an Avro schema from")
        avro_schema, _ = read_container(bytes(first.content))
        if avro_schema.get("type") != "record":
            raise ValueError("top-level Avro schema must be a record")
        schema = ", ".join(
            f"`{f['name']}` {avro_type_to_spark(f['type'])}"
            for f in avro_schema["fields"]
        )
    # target column order fixed driver-side — decode maps by NAME
    target_names = [f.name for f in spark.createDataFrame([], schema).schema.fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, payload in zip(pdf["path"], pdf["content"]):
                try:
                    _, recs = read_container(bytes(payload))
                except ValueError as ex:
                    if skip_corrupt:
                        continue
                    raise ValueError(f"{fpath}: {ex}") from ex
                rows.extend(tuple(r.get(c) for c in target_names) for r in recs)
            yield pd.DataFrame(rows, columns=target_names)

    return files.mapInPandas(decode, schema)


def write_avro_python(
    df: DataFrame, path: str, codec: str = "deflate"
) -> list[tuple[str, int, int]]:
    """Library-free Avro write (r6): one container file per partition,
    written by the pure-Python codec inside ``mapInPandas`` with plain
    file IO — POSIX-visible paths only (local disk, NFS); object
    stores need the connector jar. Returns ``[(file, n_records,
    n_bytes)]``. Deterministic bytes per (partition, data): retried
    tasks rewrite identical files. Nullable ints that arrive through
    Arrow as floats are re-narrowed from the declared Spark schema."""
    import os

    from lakeflush_spark.io import local_path
    from lakeflush_spark.operators.avro_codec import spark_field_to_avro

    lp = local_path(path)
    if lp is None:
        raise ValueError(
            f"write_avro_python writes with plain file IO; {path!r} is not "
            "a locally-visible path — use the spark-avro connector for "
            "object stores"
        )
    os.makedirs(lp, exist_ok=True)
    fields = df.schema.fields
    avro_schema = {
        "type": "record",
        "name": "row",
        "fields": [spark_field_to_avro(f.name, f.dataType) for f in fields],
    }
    int_cols = {
        f.name for f in fields if f.dataType.simpleString() in ("int", "bigint")
    }
    names = [f.name for f in fields]

    def write(batches):
        import pandas as pd
        from pyspark import TaskContext

        from lakeflush_spark.operators.avro_codec import write_container

        recs = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rec = {}
                for c, v in zip(names, row):
                    if v is None or (isinstance(v, float) and v != v):
                        rec[c] = None  # None / NaN from Arrow nulls
                    elif c in int_cols:
                        rec[c] = int(v)  # Arrow nullable-int -> float fixup
                    else:
                        rec[c] = v
                recs.append(rec)
        pid = TaskContext.get().partitionId()
        payload = write_container(avro_schema, recs, codec)
        fn = os.path.join(lp, f"part-{pid:05d}.avro")
        with open(fn, "wb") as fh:
            fh.write(payload)
        yield pd.DataFrame(
            [(fn, len(recs), len(payload))],
            columns=["file", "n_records", "n_bytes"],
        )

    out = df.mapInPandas(write, "file string, n_records long, n_bytes long")
    return [(r.file, int(r.n_records), int(r.n_bytes)) for r in out.collect()]


def read_jdbc(
    spark: SparkSession, url: str, table: str, predicates: dict | None = None
) -> DataFrame:
    """JDBC table read. ``predicates`` maps option names to values —
    pass partitionColumn/lowerBound/upperBound/numPartitions for a
    parallel read; a single-connection read of a big table is a
    driver-shaped bottleneck at scale."""

    def go():
        reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in (predicates or {}).items():
            reader = reader.option(k, str(v))
        df = reader.load()
        df.schema
        return df

    return _wrap(go, _JDBC_HINT)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    options: dict | None = None,
) -> None:
    """JDBC table write (the lake → operational-store handoff).

    Executors open one connection per partition — ``df.coalesce(n)``
    first to bound connection count against a small database. Same
    driver-jar contract as :func:`read_jdbc`."""

    def go():
        writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in (options or {}).items():
            writer = writer.option(k, str(v))
        writer.mode(mode).save()

    return _wrap(go, _JDBC_HINT)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Structured-Streaming Kafka source: value bytes + metadata
    columns; parse with ``from_json``/``decode`` downstream. Pair with
    the engine's windows/watermarks (streaming module) exactly like
    the file source — the pipeline code is source-agnostic."""

    def go():
        df = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
            .load()
        )
        df.schema
        return df

    return _wrap(go, _KAFKA_HINT)
