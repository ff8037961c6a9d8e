from lakeflush_spark.operators.compaction import (
    CompactionConfig,
    CompactionResult,
    compact,
)
from lakeflush_spark.operators.manifest import scan_manifest

__all__ = ["CompactionConfig", "CompactionResult", "compact", "scan_manifest"]
