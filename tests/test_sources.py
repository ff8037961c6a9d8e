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
    # r6: fallback=True (default) degrades to the pure-Python reader
    # instead — the hint remains reachable with fallback=False
    with pytest.raises(MissingConnectorError, match="spark-avro"):
        read_avro(spark, str(tmp_path), fallback=False)


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


# ---------------------------------------------------------------------------
# r6: library-free Avro (operators/avro_codec.py + the binaryFile/
# mapInPandas rails) — round-trips, connector-absent fallback, and
# spec compliance cross-checked against the JVM Avro library in BOTH
# directions.
# ---------------------------------------------------------------------------


def _avro_frame(spark):
    import pyspark.sql.functions as F

    return spark.range(40).select(
        F.col("id"),
        F.when(F.col("id") % 3 != 0, F.concat(F.lit("n"), F.col("id"))).alias("name"),
        (F.col("id") * 1.5).alias("score"),
        F.array(F.lit("a"), F.concat(F.lit("t"), F.col("id"))).alias("tags"),
        F.create_map(F.lit("k"), F.col("id")).alias("props"),
        F.encode(F.concat(F.lit("b"), F.col("id")), "utf-8").alias("blob"),
    )


def test_avro_python_roundtrip_spark(spark, tmp_path):
    from lakeflush_spark.sources import read_avro_python, write_avro_python

    df = _avro_frame(spark).repartition(3)
    out = write_avro_python(df, str(tmp_path / "avro"), codec="deflate")
    assert sum(n for _, n, _ in out) == 40 and len(out) == 3
    back = read_avro_python(spark, str(tmp_path / "avro"))
    a = {tuple(r) for r in df.select("id", "name", "score").collect()}
    b = {tuple(r) for r in back.select("id", "name", "score").collect()}
    assert a == b
    row = {r.id: r for r in back.collect()}
    assert list(row[7].tags) == ["a", "t7"]
    assert dict(row[7].props) == {"k": 7}
    assert bytes(row[7].blob) == b"b7"
    assert row[9].name is None  # nullable union survives


def test_read_avro_falls_back_without_connector(spark, tmp_path):
    """In this jar-less container read_avro must transparently serve
    the python path (fallback=True default) and still honor
    fallback=False with the actionable connector hint."""
    import pytest

    from lakeflush_spark.sources import MissingConnectorError, read_avro, write_avro_python

    df = _avro_frame(spark).select("id", "name")
    write_avro_python(df, str(tmp_path / "a2"), codec="null")
    try:
        spark.read.format("avro").load(str(tmp_path / "a2")).schema
        pytest.skip("spark-avro connector present; fallback path cannot fire")
    except Exception:
        pass
    back = read_avro(spark, str(tmp_path / "a2"))
    assert back.count() == 40
    with pytest.raises(MissingConnectorError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "a2"), fallback=False)


def test_avro_python_cross_validates_with_jvm_library(spark, tmp_path):
    """Spec compliance, not self-consistency: the JVM Avro library
    (bundled with Spark) reads our files; we read files it writes."""
    import json

    from lakeflush_spark.operators.avro_codec import read_container
    from lakeflush_spark.sources import write_avro_python

    if getattr(spark, "_jvm", None) is None:
        import pytest

        pytest.skip("needs the py4j bridge for the JVM cross-check")
    jvm = spark._jvm
    df = _avro_frame(spark).select("id", "name", "score").coalesce(1)
    (file, n, _), = write_avro_python(df, str(tmp_path / "ours"))
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(file), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        got.append(reader.next())
    assert len(got) == n == 40
    by_id = {g.get("id"): g for g in got}
    assert str(by_id[7].get("name")) == "n7" and by_id[7].get("score") == 10.5
    assert by_id[9].get("name") is None

    # reverse: the JVM writes, we decode
    schema = {
        "type": "record", "name": "jr",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "label", "type": "string"}],
    }
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    jf = str(tmp_path / "theirs.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(jschema, jvm.java.io.File(jf))
    for i in range(7):
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("id", i)
        rec.put("label", f"L{i}")
        writer.append(rec)
    writer.close()
    _, recs = read_container(open(jf, "rb").read())
    assert [(r["id"], r["label"]) for r in recs] == [(i, f"L{i}") for i in range(7)]


def test_write_avro_python_rejects_remote_paths(spark):
    import pytest

    from lakeflush_spark.sources import write_avro_python

    with pytest.raises(ValueError, match="locally-visible"):
        write_avro_python(spark.range(1), "s3a://bucket/avro")


def test_avro_source_compacts_to_parquet(spark, tmp_path):
    """avro -> parquet bundles end-to-end through compact(), reading
    via the pure-Python fallback in this jar-less container."""
    from lakeflush_spark.operators.compaction import (
        CompactionConfig,
        compact,
        read_bundles,
    )
    from lakeflush_spark.sources import write_avro_python

    df = _avro_frame(spark).select("id", "name", "score").repartition(4)
    src = tmp_path / "avro_lake"
    write_avro_python(df, str(src))
    res = compact(
        spark,
        CompactionConfig(
            source_dir=str(src),
            dest_dir=str(tmp_path / "bundles"),
            file_format="avro",
            output_format="parquet",
        ),
    )
    assert res.bundles and res.source_files == 4
    back = read_bundles(spark, str(tmp_path / "bundles"), fmt="parquet")
    assert back.count() == 40
    assert {tuple(r) for r in back.select("id", "score").collect()} == {
        tuple(r) for r in df.select("id", "score").collect()
    }


def test_avro_python_maps_fields_by_name_across_files(spark, tmp_path):
    """Regression (r6 review): files whose writer schemas order the
    same fields differently must decode by NAME, not position — and a
    field a file lacks comes back NULL."""
    import os

    from lakeflush_spark.operators.avro_codec import write_container
    from lakeflush_spark.sources import read_avro_python

    d = tmp_path / "mixed"
    os.makedirs(d)
    ab = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "long"}]}
    ba = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "long"}, {"name": "a", "type": "long"}]}
    b_only = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "long"}]}
    (d / "f1.avro").write_bytes(write_container(ab, [{"a": 1, "b": 100}]))
    (d / "f2.avro").write_bytes(write_container(ba, [{"a": 2, "b": 200}]))
    (d / "f3.avro").write_bytes(write_container(b_only, [{"b": 300}]))
    got = {r.b: r.a for r in read_avro_python(spark, str(d), schema="a long, b long").collect()}
    assert got == {100: 1, 200: 2, 300: None}


def test_avro_python_glob_and_non_avro_error(spark, tmp_path):
    """Regression (r6 review): glob filters like the connector's
    pathGlobFilter; by default all visible files are read and a
    non-Avro file raises naming its path."""
    import os

    import pytest

    from lakeflush_spark.operators.avro_codec import write_container
    from lakeflush_spark.sources import read_avro_python

    d = tmp_path / "lake"
    os.makedirs(d)
    sch = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    # extension-less container file (some writers): must be readable
    (d / "part-00000").write_bytes(write_container(sch, [{"a": 1}]))
    (d / "events.avro").write_bytes(write_container(sch, [{"a": 2}]))
    assert {r.a for r in read_avro_python(spark, str(d)).collect()} == {1, 2}
    assert {r.a for r in read_avro_python(spark, str(d), glob="*.avro").collect()} == {2}
    (d / "junk.txt").write_bytes(b"not avro at all")
    with pytest.raises(Exception, match="junk.txt"):
        read_avro_python(spark, str(d), schema="a long").collect()


def test_avro_truncated_values_raise():
    """Regression (r6 review): truncation inside boolean/fixed/float
    fields raises instead of emitting plausible wrong values."""
    import io

    import pytest

    from lakeflush_spark.operators import avro_codec as ac

    assert ac._decode("boolean", io.BytesIO(b"\x01")) is True
    with pytest.raises(ValueError, match="truncated Avro boolean"):
        ac._decode("boolean", io.BytesIO(b""))
    with pytest.raises(ValueError, match="truncated Avro fixed"):
        ac._decode({"type": "fixed", "name": "f", "size": 4}, io.BytesIO(b"ab"))
    with pytest.raises(ValueError, match="truncated Avro float"):
        ac._decode("float", io.BytesIO(b"\x00\x00"))
    with pytest.raises(ValueError, match="truncated Avro double"):
        ac._decode("double", io.BytesIO(b"\x00\x00\x00\x00"))


def test_avro_corrupt_handling_and_enum_bounds(spark, tmp_path):
    """r6 hardening: corrupt deflate blocks / bad enum indexes raise
    ValueError (path-named through the reader); skip_corrupt=True and
    compaction's ignore_corrupt_files skip such files instead."""
    import io
    import os

    import pytest

    from lakeflush_spark.operators import avro_codec as ac
    from lakeflush_spark.sources import read_avro_python

    # enum decode validates its index (0x01 zigzag-decodes to -1)
    enum_sch = {"type": "enum", "name": "e", "symbols": ["A", "B"]}
    assert ac._decode(enum_sch, io.BytesIO(b"\x02")) == "B"
    with pytest.raises(ValueError, match="enum index"):
        ac._decode(enum_sch, io.BytesIO(b"\x01"))

    d = tmp_path / "lake"
    os.makedirs(d)
    sch = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    good = ac.write_container(sch, [{"a": 1}], codec="deflate")
    bad = bytearray(ac.write_container(sch, [{"a": 2}], codec="deflate"))
    bad[-20] ^= 0xFF  # flip a bit inside the deflate block
    (d / "good.avro").write_bytes(good)
    (d / "bad.avro").write_bytes(bytes(bad))
    with pytest.raises(Exception, match="bad.avro"):
        read_avro_python(spark, str(d), schema="a long").collect()
    got = read_avro_python(spark, str(d), schema="a long", skip_corrupt=True)
    assert [r.a for r in got.collect()] == [1]
