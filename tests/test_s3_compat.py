"""Real-S3 contract for the compat S3 twins, against a moto mock.

The reference's S3 classes are boto3-native (collectors/s3_lake.py,
flushers/s3_lake.py); these tests exercise the engine's boto3 path
end-to-end — object listing/staging on collect, overwrite-PUT on
flush — against an in-process mocked S3 endpoint, the same contract
shape the reference's own suite uses.
"""

import glob
import json
import os

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from moto import mock_aws  # noqa: E402

from lakeflush_spark.compat import S3LakeCollector, S3LakeFlusher  # noqa: E402
from lakeflush_spark.compat.files import FileType  # noqa: E402
from lakeflush_spark.compat.s3 import (  # noqa: E402
    download_prefix,
    is_s3_uri,
    parse_s3_uri,
    upload_file,
)

BUCKET = "lakeflush-test-bucket"


@pytest.fixture()
def s3_mock(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "testing")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "testing")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    with mock_aws():
        client = boto3.client("s3")
        client.create_bucket(Bucket=BUCKET)
        yield client


def test_uri_helpers():
    assert is_s3_uri("s3a://b/k") and is_s3_uri("s3://b") and not is_s3_uri("file:///x")
    assert parse_s3_uri("s3a://bucket/a/b/") == ("bucket", "a/b")
    assert parse_s3_uri("s3://bucket") == ("bucket", "")


def test_download_prefix_stages_objects(s3_mock, tmp_path):
    for i in range(5):
        s3_mock.put_object(Bucket=BUCKET, Key=f"lake/f{i}.json", Body=b'{"k":%d}' % i)
    s3_mock.put_object(Bucket=BUCKET, Key="other/skip.json", Body=b"{}")
    # string-prefix sibling: "lake" must NOT collect "lake2/"
    s3_mock.put_object(Bucket=BUCKET, Key="lake2/evil.json", Body=b"{}")
    dest = str(tmp_path / "staged")
    assert download_prefix(f"s3a://{BUCKET}/lake", dest) == 5
    assert sorted(os.listdir(dest)) == [f"f{i}.json" for i in range(5)]


def test_download_prefix_preserves_subtree(s3_mock, tmp_path):
    # same basename under different sub-prefixes must NOT collide
    s3_mock.put_object(Bucket=BUCKET, Key="lake/2024-01/part-0000.json", Body=b'{"m":1}')
    s3_mock.put_object(Bucket=BUCKET, Key="lake/2024-02/part-0000.json", Body=b'{"m":2}')
    dest = str(tmp_path / "staged")
    assert download_prefix(f"s3a://{BUCKET}/lake", dest) == 2
    assert open(os.path.join(dest, "2024-01", "part-0000.json")).read() == '{"m":1}'
    assert open(os.path.join(dest, "2024-02", "part-0000.json")).read() == '{"m":2}'


def test_s3_collector_end_to_end(spark, s3_mock, tmp_path):
    # small-file JSON lake living in (mock) S3
    n = 40
    for i in range(n):
        s3_mock.put_object(
            Bucket=BUCKET,
            Key=f"lake/doc_{i:03d}.json",
            Body=json.dumps({"id": i, "body": f"doc {i}"}).encode() + b"\n",
        )
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    collector = S3LakeCollector(
        BUCKET,
        prefix="lake",
        file_type=FileType.JSON,
        match_patterns=["*.json"],
        filepath=stage,
        filename="s3-bundle",
        max_size_mb=1,
    )
    bundles = collector.start()
    assert bundles and all(".lakeflush.collected" in b for b in bundles)
    # row-multiset round trip out of S3
    docs = []
    for b in bundles:
        with open(b) as f:
            docs += [json.loads(ln) for ln in f if ln.strip()]
    assert sorted(d["id"] for d in docs) == list(range(n))
    # staging dirs cleaned up
    assert not glob.glob(os.path.join(stage, ".lakeflush-s3-staging-*"))


def test_s3_flusher_upload_and_overwrite(s3_mock, tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    bundle = os.path.join(stage, "b.123.abc.lakeflush.collected")
    with open(bundle, "w") as f:
        f.write('{"k": 1}\n')

    flusher = S3LakeFlusher(BUCKET, stage, "b", prefix="flushed")
    flusher.flush(bundle)
    key = "flushed/b.123.abc.lakeflush"
    got = s3_mock.get_object(Bucket=BUCKET, Key=key)["Body"].read()
    assert got == b'{"k": 1}\n'
    # bundle stays local after upload (reference parity)
    assert os.path.exists(bundle)

    # overwrite semantics: re-flushing replaces the object
    with open(bundle, "w") as f:
        f.write('{"k": 2}\n')
    flusher.flush(bundle)
    assert s3_mock.get_object(Bucket=BUCKET, Key=key)["Body"].read() == b'{"k": 2}\n'


def test_s3_flusher_partitioned_delivery(s3_mock, tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    bundle = os.path.join(stage, "b.9.def.lakeflush.collected")
    with open(bundle, "w") as f:
        f.write("x\n")
    S3LakeFlusher(
        BUCKET, stage, "b", date_partition_format="date=%Y-%m-%d"
    ).flush(bundle)
    keys = [o["Key"] for o in s3_mock.list_objects_v2(Bucket=BUCKET)["Contents"]]
    assert len(keys) == 1 and keys[0].startswith("date=") and keys[0].endswith("b.9.def.lakeflush")


def test_upload_file_helper(s3_mock, tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hello")
    upload_file(str(p), f"s3://{BUCKET}/a/b/x.txt")
    assert s3_mock.get_object(Bucket=BUCKET, Key="a/b/x.txt")["Body"].read() == b"hello"


def test_s3_csv_reader_empty_first_object_does_not_eat_next_header(s3_mock):
    """r13 (ADVICE): the S3 CSV twin of the empty-first-file header
    fix — '' from an empty object must not become the remembered
    header."""
    from lakeflush_spark.compat.s3 import S3CSVFileReader

    s3_mock.put_object(Bucket=BUCKET, Key="a.csv", Body=b"")
    s3_mock.put_object(Bucket=BUCKET, Key="b.csv", Body=b"col1,col2\n1,2\n")
    s3_mock.put_object(Bucket=BUCKET, Key="c.csv", Body=b"col1,col2\n3,4\n")

    r = S3CSVFileReader(header=True, bucket=BUCKET, batch_size=10)
    assert list(r.read("a.csv")) == []
    assert r.header_data is None
    assert list(r.read("b.csv")) == ["col1,col2", "1,2"]
    assert list(r.read("c.csv")) == ["3,4"]
