from lakeflush_spark.compat.flushers import LocalLakeFlusher, S3LakeFlusher

__all__ = ["LocalLakeFlusher", "S3LakeFlusher"]
