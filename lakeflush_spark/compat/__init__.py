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
- ``FileType`` / ``FileStatus`` / ``FileStore``
                                     utils/file/ → compat.files

The compat layer is for drop-in use; new code should call the engine
directly (``lakeflush_spark.operators.compaction.compact`` and the
declared query surface in ``lakeflush_spark.plans``).
"""

from lakeflush_spark.compat.collectors import LocalLakeCollector, S3LakeCollector
from lakeflush_spark.compat.core import Collector, Flusher
from lakeflush_spark.compat.files import FileStatus, FileStore, FileType
from lakeflush_spark.compat.flushers import LocalLakeFlusher, S3LakeFlusher

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
]
