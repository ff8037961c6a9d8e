"""Spark Connect portability guards (r6, VERDICT r5 #2).

Connect sessions expose no ``_jvm``/``_jsc`` py4j bridge. Every
remaining private-API site (compaction FS helpers, vacuum_runs) must
degrade to a metadata-only DataFrame job or plain Python IO — these
tests force the degraded path by stubbing the bridge probe away and
assert it produces the same answers as the JVM path on a real local
source tree.
"""

import gzip
import os

import pytest

from lakeflush_spark.io import hadoop_fs, local_path


def test_hadoop_fs_probe_detects_missing_bridge(spark):
    class FakeConnectSession:
        @property
        def _jvm(self):  # Spark Connect raises on this attribute
            raise AttributeError("_jvm is not supported in Spark Connect")

    assert hadoop_fs(FakeConnectSession(), "/tmp/x") is None
    assert hadoop_fs(spark, "/tmp") is not None  # classic session: bridge up


def test_local_path_forms():
    assert local_path("/a/b") == "/a/b"
    assert local_path("rel/path") == "rel/path"
    assert local_path("file:/a/b") == "/a/b"
    assert local_path("file:///a/b") == "/a/b"
    assert local_path("file://remotehost/a") is None  # non-empty authority
    assert local_path("s3a://bucket/key") is None
    assert local_path("hdfs://nn/a") is None


@pytest.fixture()
def small_lake(tmp_path):
    # no hidden/empty files: the JVM fast path (getContentSummary)
    # counts raw files, the manifest path counts visible non-empty ones
    # — they only agree on a clean lake, which is what the equality
    # check below needs
    src = tmp_path / "lake"
    src.mkdir()
    for i in range(5):
        (src / f"f{i}.json").write_text('{"k": %d}\n' % i * (i + 1))
    return src


def test_source_stats_fallback_matches_jvm_path(spark, small_lake, monkeypatch):
    import lakeflush_spark.operators.compaction as comp

    cfg = comp.CompactionConfig(
        source_dir=str(small_lake), dest_dir="/tmp/unused", file_format="json"
    )
    jvm_stats = comp._source_stats(spark, cfg)
    jvm_first = comp._first_source_file(spark, cfg)
    monkeypatch.setattr(comp, "hadoop_fs", lambda *_: None)
    fb_stats = comp._source_stats(spark, cfg)
    fb_first = comp._first_source_file(spark, cfg)
    # file counts/bytes agree; first-file is the same file (URI form may
    # differ between the walk and the manifest listing)
    assert fb_stats[0] == jvm_stats[0] and fb_stats[1] == jvm_stats[1]
    assert os.path.basename(fb_first) == os.path.basename(jvm_first)
    # missing root degrades to empty, not an exception
    gone = comp.CompactionConfig(
        source_dir=str(small_lake) + "_missing", dest_dir="/tmp/u", file_format="json"
    )
    assert comp._source_stats(spark, gone) == (0, 0, None)
    assert comp._first_source_file(spark, gone) is None


def test_sample_source_head_fallback(spark, small_lake, monkeypatch):
    import lakeflush_spark.operators.compaction as comp

    f = str(small_lake / "f4.json")
    want = comp._sample_source_head(spark, f)
    monkeypatch.setattr(comp, "hadoop_fs", lambda *_: None)
    assert comp._sample_source_head(spark, f) == want  # local-IO path
    # remote-scheme shape: force the binaryFile branch too
    monkeypatch.setattr(comp, "local_path", lambda *_: None)
    assert comp._sample_source_head(spark, f) == want


def test_list_bundles_fallback_matches_jvm_path(spark, tmp_path, monkeypatch):
    import lakeflush_spark.operators.compaction as comp

    dest = tmp_path / "dest"
    (dest / "_lakeflush_audit").mkdir(parents=True)
    (dest / "_lakeflush_audit" / "a.json").write_text("{}")
    (dest / "b1.txt").write_text("x" * 10)
    (dest / "b2.txt.gz").write_bytes(gzip.compress(b"y" * 10))
    jvm_bundles = comp._list_bundles(spark, str(dest))
    monkeypatch.setattr(comp, "hadoop_fs", lambda *_: None)
    fb_bundles = comp._list_bundles(spark, str(dest))
    norm = lambda rows: [(os.path.basename(p), s) for p, s, _ in rows]  # noqa: E731
    assert norm(fb_bundles) == norm(jvm_bundles)
    assert {n for n, _ in norm(fb_bundles)} == {"b1.txt", "b2.txt.gz"}
    assert comp._list_bundles(spark, str(dest) + "_missing") == []


def test_vacuum_runs_fallback(spark, tmp_path, monkeypatch):
    import lakeflush_spark.io as lio
    from lakeflush_spark.streaming.dedup import vacuum_runs

    store = tmp_path / "store"
    for run in ("gen1", "gen2"):
        d = store / f"run={run}" / "batch=0"
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"\x00")
    monkeypatch.setattr(lio, "hadoop_fs", lambda *_: None)
    assert vacuum_runs(spark, str(store), ["gen2"]) == ["gen1"]
    assert sorted(os.listdir(store)) == ["run=gen2"]
    # remote store without the bridge: documented fail-fast
    with pytest.raises(RuntimeError, match="storage-native"):
        vacuum_runs(spark, "s3a://bucket/store", ["gen1"])


def test_spread_for_compute_degrades_without_rdd_surface(spark):
    """Connect sessions expose no sparkContext/df.rdd — the scan
    fixup must pass the frame through untouched, not crash."""
    from lakeflush_spark.io import spread_for_compute

    df = spark.range(10)

    class FakeConnectSession:
        @property
        def sparkContext(self):
            raise AttributeError("sparkContext is not supported in Spark Connect")

    out = spread_for_compute(df, FakeConnectSession())
    assert out is df
    # classic path still spreads an under-parallelized frame
    spread = spread_for_compute(df.coalesce(1), spark)
    assert spread.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_s3_flusher_delivers_without_jvm_bridge(tmp_path, monkeypatch):
    """r7 (VERDICT r6 wrong #2): on a session with no py4j bridge the
    compat S3LakeFlusher degrades — plain IO for local/file: URIs,
    an actionable error (not an AttributeError) for remote non-S3
    ones — instead of dying on ``spark._jvm``."""
    import lakeflush_spark.compat.flushers as fl
    from lakeflush_spark.compat.files import FileStatus
    from lakeflush_spark.compat.flushers import S3LakeFlusher

    stage = tmp_path / "stage"
    stage.mkdir()
    bundle = stage / f"b.lakeflush{FileStatus.COLLECTED}"
    bundle.write_text("payload")

    flusher = S3LakeFlusher(f"file://{tmp_path}/lake", str(stage), "b")
    # simulate Connect: the bridge probe returns None
    monkeypatch.setattr(
        S3LakeFlusher, "_fs_and_path", lambda self, uri: None
    )
    flusher.flush(str(bundle))
    assert (tmp_path / "lake" / "b.lakeflush").read_text() == "payload"

    # remote non-S3 destination without a bridge: actionable fail-fast
    hdfs = S3LakeFlusher("hdfs://nn/lake", str(stage), "b")
    monkeypatch.setattr(
        S3LakeFlusher, "_s3a_usable", lambda self: False
    )
    with pytest.raises(RuntimeError, match="no JVM filesystem bridge"):
        hdfs.flush(str(bundle))
