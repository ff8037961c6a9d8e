"""API-compatibility facade: the reference's public classes, Spark
underneath.

A user of the reference package switches by changing one import::

    # before: from lakeflush.collectors import LocalLakeCollector
    from lakeflush_spark.compat import LocalLakeCollector

Surface map (reference file:line → here):

- ``Collector`` / ``Flusher``        core/collector.py, core/flusher.py → compat.core
- ``LocalLakeCollector`` / ``S3LakeCollector``
                                     collectors/ → compat.collectors (start() = one Spark job)
- ``LocalLakeFlusher`` / ``S3LakeFlusher``
                                     flushers/ → compat.flushers
- ``FileType`` / ``FileStatus`` / ``FileStore`` / ``FileProcessor``
  / ``CSVFileReader`` / ``JSONFileReader``
                                     utils/file/ → compat.files
- ``S3Store`` / ``S3Processor`` / ``S3CSVFileReader`` / ``S3JSONFileReader``
                                     utils/s3/ → compat.s3
- ``SizedTimedRotatingFileHandler`` / ``GzipSizedTimedRotatingFileHandler``
  / ``FileRotationEventHandler``     core/*handler.py → compat.handlers

The compat layer is for drop-in use; new code should call the engine
directly (``lakeflush_spark.operators.compaction.compact`` and the
declared query surface in ``lakeflush_spark.plans``).
"""

from lakeflush_spark.compat.collectors import LocalLakeCollector, S3LakeCollector
from lakeflush_spark.compat.core import Collector, Flusher
from lakeflush_spark.compat.files import (
    CSVFileReader,
    FileProcessor,
    FileStatus,
    FileStore,
    FileType,
    JSONFileReader,
)
from lakeflush_spark.compat.flushers import LocalLakeFlusher, S3LakeFlusher
from lakeflush_spark.compat.handlers import (
    FileRotationEventHandler,
    GzipSizedTimedRotatingFileHandler,
    SizedTimedRotatingFileHandler,
)
from lakeflush_spark.compat.s3 import (
    S3CSVFileReader,
    S3JSONFileReader,
    S3Processor,
    S3Store,
)

__all__ = [
    "Collector",
    "Flusher",
    "LocalLakeCollector",
    "S3LakeCollector",
    "LocalLakeFlusher",
    "S3LakeFlusher",
    "FileType",
    "FileStatus",
    "FileStore",
    "FileProcessor",
    "CSVFileReader",
    "JSONFileReader",
    "S3Store",
    "S3Processor",
    "S3CSVFileReader",
    "S3JSONFileReader",
    "SizedTimedRotatingFileHandler",
    "GzipSizedTimedRotatingFileHandler",
    "FileRotationEventHandler",
]
