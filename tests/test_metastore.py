"""Metastore (O17 surface, utils/metastore.py parity) + metrics (O16)."""

import pyspark.sql.functions as F
import pytest

from lakeflush_spark.metastore import ParquetMetastore
from lakeflush_spark.metrics import PipelineMetrics, observe_collected


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetMetastore(spark, str(tmp_path / "meta"))


def test_set_get_roundtrip(store):
    assert store.get("pipeline.format") is None
    store.set("pipeline.format", "json")
    assert store.get("pipeline.format") == "json"


def test_versioning_history(store):
    v1 = store.set("cfg", "a")
    v2 = store.set("cfg", "b")
    assert (v1, v2) == (1, 2)
    assert store.get("cfg") == "b"
    assert store.versions("cfg") == [(1, "a"), (2, "b")]


def test_unversioned_set_reuses_version(store):
    store.set("cfg", "a")
    v = store.set("cfg", "b", versioned=False)
    assert v == 1
    assert store.get("cfg") == "b"  # latest by timestamp within version


def test_like_search(store):
    store.set("source.lake.dir", "/in")
    store.set("dest.lake.dir", "/out")
    store.set("max_size_mb", "16")
    assert store.search("%.lake.%") == {"source.lake.dir": "/in", "dest.lake.dir": "/out"}
    assert store.search("%/out%", in_values=True) == {"dest.lake.dir": "/out"}


def test_delete_and_keys(store):
    store.set("a", "1")
    store.set("b", "2")
    store.delete("a")
    assert store.get("a") is None
    assert store.keys() == ["b"]


def test_clear(store):
    store.set("a", "1")
    store.set("b", "2")
    store.clear()
    assert store.keys() == []


def test_timestamps(store):
    store.set("k", "v1")
    store.set("k", "v2")
    value, created, updated = store.get_with_timestamps("k")
    assert value == "v2"
    assert created <= updated


def test_compact_folds_history(store):
    for i in range(5):
        store.set("k", f"v{i}")
    store.set("gone", "x")
    store.delete("gone")
    store.compact()
    assert store.get("k") == "v4"
    assert store.get("gone") is None
    # history folded away: a single live row remains
    assert store._log().count() == 1


def test_queryable_dataframe(store):
    store.set("a", "1")
    store.set("b", "2")
    df = store.as_dataframe()
    assert {r["key"]: r["value"] for r in df.collect()} == {"a": "1", "b": "2"}


def test_observe_metrics(spark):
    m = PipelineMetrics()
    df = spark.range(100).select(F.concat(F.lit("rec"), F.col("id")).alias("value"))
    observed, obs = observe_collected(df)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    m.add(collected=got["rows"], nbytes=got["bytes"])
    assert m.collected == 100
    assert m.bytes_collected > 100  # rows + newline accounting
