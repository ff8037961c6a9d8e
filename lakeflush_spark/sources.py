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

Avro and Kafka need datasource jars that are deploy-time choices on a
real cluster and are absent here, so each wraps its reader with an
actionable error instead of Spark's raw ClassNotFound chain:

- **Avro**: ``--packages org.apache.spark:spark-avro_2.13:<spark-ver>``
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


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Batch-read Avro files (columnar-compatible: compactable to
    parquet/orc via ``CompactionConfig(output_format=...)``)."""

    def go():
        reader = spark.read.format("avro").option("recursiveFileLookup", "true")
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.load(path)
        df.schema  # force source resolution so the error surfaces here
        return df

    return _wrap(go, _AVRO_HINT)


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
