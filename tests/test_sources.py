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
