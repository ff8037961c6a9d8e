"""Deep import-path parity: every module path in the reference
package imports here too, and exposes the same public class names.

The reference's users import from deep paths (``from
lakeflush.core.file_handler import SizedTimedRotatingFileHandler``),
not just the package facades — drop-in compatibility means every one
of those statements keeps working. The matrix below is the complete
module inventory of /root/reference/lakeflush/** (r12; 34 modules)
with each module's public classes/constants.
"""

import importlib

import pytest

#: module path -> names it must expose (reference file of the same
#: dotted path defines exactly these publics)
REFERENCE_MODULES = {
    "lakeflush": [],
    "lakeflush.version": [
        "VERSION_MAJOR", "VERSION_MINOR", "VERSION_BUILD",
        "VERSION_INFO", "VERSION_STRING", "__version__",
    ],
    "lakeflush.core": ["Collector", "Flusher"],
    "lakeflush.core.collector": ["Collector"],
    "lakeflush.core.flusher": ["Flusher"],
    "lakeflush.core.event_handler": ["FileRotationEventHandler"],
    "lakeflush.core.file_handler": ["SizedTimedRotatingFileHandler"],
    "lakeflush.core.gzipfile_handler": ["GzipSizedTimedRotatingFileHandler"],
    "lakeflush.collectors": ["LocalLakeCollector", "S3LakeCollector"],
    "lakeflush.collectors.local_lake": ["LocalLakeCollector"],
    "lakeflush.collectors.s3_lake": ["S3LakeCollector"],
    "lakeflush.flushers": ["LocalLakeFlusher", "S3LakeFlusher"],
    "lakeflush.flushers.local_lake": ["LocalLakeFlusher"],
    "lakeflush.flushers.s3_lake": ["S3LakeFlusher"],
    "lakeflush.utils": [],
    "lakeflush.utils.logger": ["Logger"],
    "lakeflush.utils.metastore": ["SQLiteMetastore"],
    "lakeflush.utils.metadata": [],
    "lakeflush.utils.metadata.key": ["MetaDataKey"],
    "lakeflush.utils.metadata.store": ["MetaDataStore"],
    "lakeflush.utils.file": [
        "FileStatus", "FileStore", "FileProcessor", "FileType",
    ],
    "lakeflush.utils.file.processor": ["FileProcessor"],
    "lakeflush.utils.file.status": ["FileStatus"],
    "lakeflush.utils.file.store": ["FileStore"],
    "lakeflush.utils.file.type": ["FileType"],
    "lakeflush.utils.file.reader": ["CSVFileReader", "JSONFileReader"],
    "lakeflush.utils.file.reader.csv": ["CSVFileReader"],
    "lakeflush.utils.file.reader.json": ["JSONFileReader"],
    "lakeflush.utils.s3": ["S3Processor", "S3Store"],
    "lakeflush.utils.s3.processor": ["S3Processor"],
    "lakeflush.utils.s3.store": ["S3Store"],
    "lakeflush.utils.s3.reader": ["S3CSVFileReader", "S3JSONFileReader"],
    "lakeflush.utils.s3.reader.csv": ["S3CSVFileReader"],
    "lakeflush.utils.s3.reader.json": ["S3JSONFileReader"],
}


@pytest.mark.parametrize("module_path", sorted(REFERENCE_MODULES))
def test_reference_module_path_imports(module_path):
    mod = importlib.import_module(module_path)
    for name in REFERENCE_MODULES[module_path]:
        assert hasattr(mod, name), f"{module_path} lacks {name}"


def test_deep_and_facade_imports_are_the_same_object():
    """The deep path and the package facade must hand back the SAME
    class, so isinstance checks across import styles agree."""
    from lakeflush.collectors import LocalLakeCollector as facade_c
    from lakeflush.collectors.local_lake import LocalLakeCollector as deep_c
    from lakeflush.core import Collector as facade_core
    from lakeflush.core.collector import Collector as deep_core
    from lakeflush.utils.file import FileStore as facade_fs
    from lakeflush.utils.file.store import FileStore as deep_fs

    assert facade_c is deep_c
    assert facade_core is deep_core
    assert facade_fs is deep_fs


def test_version_triple_matches_reference():
    from lakeflush.version import (
        VERSION_BUILD,
        VERSION_INFO,
        VERSION_MAJOR,
        VERSION_MINOR,
        VERSION_STRING,
        __version__,
    )

    assert (VERSION_MAJOR, VERSION_MINOR, VERSION_BUILD) == (0, 1, 0)
    # the reference's derived exports (its pyproject reads
    # lakeflush.version.__version__ — a TUPLE there, mirrored exactly)
    assert VERSION_INFO == (0, 1, 0)
    assert VERSION_STRING == "0.1.0"
    assert __version__ == VERSION_INFO


def test_rotating_handlers_rotate_by_size(tmp_path):
    """The handler twins are real: a byte cap forces rollover and the
    rotation callback fires (plain + gzip)."""
    import gzip
    import logging

    from lakeflush.core.file_handler import SizedTimedRotatingFileHandler
    from lakeflush.core.gzipfile_handler import GzipSizedTimedRotatingFileHandler

    fired = []
    h = SizedTimedRotatingFileHandler(
        str(tmp_path / "plain.log"),
        maxBytes=200,
        backupCount=3,
        rotation_callback=lambda: fired.append(1),
    )
    lg = logging.getLogger("t_rot_plain")
    lg.handlers = [h]
    lg.setLevel(logging.INFO)
    lg.propagate = False
    for i in range(30):
        lg.info("x" * 40)
    h.close()
    assert fired  # at least one size-triggered rollover
    assert (tmp_path / "plain.log").exists()

    gz_fired = []
    gh = GzipSizedTimedRotatingFileHandler(
        str(tmp_path / "zipped.log"),
        maxBytes=300,
        backupCount=3,
        rotation_callback=lambda: gz_fired.append(1),
    )
    lg2 = logging.getLogger("t_rot_gz")
    lg2.handlers = [gh]
    lg2.setLevel(logging.INFO)
    lg2.propagate = False
    # enough volume to pass the 100 KiB check interval at least twice
    for i in range(600):
        lg2.info("y" * 512)
    gh.close()
    assert gz_fired
    # every produced segment (current + rotated) is a valid gzip
    # stream, and the run wrote real content somewhere
    total = 0
    for seg in tmp_path.glob("zipped.log.gz*"):
        with gzip.open(seg) as fh:
            total += len(fh.read())
    assert total > 0


def test_event_handler_routes_rotation_renames():
    from lakeflush.core.event_handler import FileRotationEventHandler

    class Evt:
        def __init__(self, event_type, dest_path):
            self.event_type = event_type
            self.dest_path = dest_path

    seen = []

    class H(FileRotationEventHandler):
        def on_collected(self, dest_path):
            seen.append(dest_path)

    h = H(keyword=".collected")
    h.dispatch(Evt("moved", "/lake/a.lakeflush.collected"))
    h.dispatch(Evt("moved", "/lake/b.lakeflush.inprogress"))
    h.dispatch(Evt("created", "/lake/c.lakeflush.collected"))
    assert seen == ["/lake/a.lakeflush.collected"]
    with pytest.raises(NotImplementedError):
        FileRotationEventHandler("k").on_moved(
            Evt("moved", "match-k-path")
        )


def test_file_processor_orders_by_mtime_recursively(tmp_path):
    import os

    from lakeflush.utils.file.processor import FileProcessor

    (tmp_path / "sub").mkdir()
    newest = tmp_path / "newest.csv"
    oldest = tmp_path / "sub" / "oldest.csv"
    middle = tmp_path / "middle.csv"
    other = tmp_path / "skip.txt"
    for p in (newest, oldest, middle, other):
        p.write_text("x")
    os.utime(oldest, (1_000, 1_000))
    os.utime(middle, (2_000, 2_000))
    os.utime(newest, (3_000, 3_000))
    os.utime(other, (500, 500))
    got = [p.name for p in FileProcessor(tmp_path, ["*.csv"])]
    assert got == ["oldest.csv", "middle.csv", "newest.csv"]


def test_csv_reader_one_header_across_sequence(tmp_path):
    from lakeflush.utils.file.reader import CSVFileReader, JSONFileReader

    f1 = tmp_path / "a.csv"
    f1.write_text("h1,h2\n1,2\n3,4\n")
    f2 = tmp_path / "b.csv"
    f2.write_text("h1,h2\n5,6\n")
    r = CSVFileReader(header=True, batch_size=10)
    assert list(r.read(str(f1))) == ["h1,h2", "1,2\n3,4"]
    assert list(r.read(str(f2))) == ["5,6"]  # header deduped (O6)
    j = tmp_path / "c.json"
    j.write_text('{"k": 1}')
    assert list(JSONFileReader().read(str(j))) == ['{"k": 1}']
    empty = tmp_path / "d.json"
    empty.write_text("")
    assert list(JSONFileReader().read(str(empty))) == []
