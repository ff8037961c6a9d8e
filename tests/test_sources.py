"""Gated external connectors: actionable errors when jars are absent
(this container), identical code path when they are present (cluster).
"""

import pytest

from lakeflush_spark.sources import (
    MissingConnectorError,
    kafka_stream,
    read_avro,
    read_jdbc,
)


def test_avro_gated_with_hint(spark, tmp_path):
    with pytest.raises(MissingConnectorError, match="spark-avro"):
        read_avro(spark, str(tmp_path))


def test_kafka_gated_with_hint(spark):
    with pytest.raises(MissingConnectorError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "events")


def test_jdbc_gated_with_hint(spark):
    # jdbc format exists in core Spark; a bogus driverless URL must
    # surface the driver hint, not a raw ClassNotFound chain
    with pytest.raises(Exception) as ei:
        read_jdbc(spark, "jdbc:postgresql://nohost/db", "t")
    assert "driver" in str(ei.value).lower()


def test_jdbc_real_roundtrip_embedded_derby(spark, tmp_path):
    """REAL JDBC against the Derby driver Spark bundles: write a
    table, read it back whole, then read it back as a PARTITIONED
    parallel scan (the at-scale shape) — values identical."""
    from lakeflush_spark.sources import write_jdbc

    db = tmp_path / "derbydb"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}

    src = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    write_jdbc(src.coalesce(1), url, "t_round", mode="overwrite", options=props)

    back = read_jdbc(spark, url, "t_round", predicates=props)
    assert back.count() == 100
    assert back.agg({"v": "sum"}).first()[0] == sum(2 * i for i in range(100))

    par = read_jdbc(
        spark, url, "t_round",
        predicates={**props, "partitionColumn": "k", "lowerBound": 0,
                    "upperBound": 100, "numPartitions": 4},
    )
    assert par.rdd.getNumPartitions() == 4
    assert sorted(r.k for r in par.collect()) == list(range(100))
