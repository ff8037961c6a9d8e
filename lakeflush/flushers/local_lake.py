from lakeflush_spark.compat.flushers import LocalLakeFlusher

__all__ = ["LocalLakeFlusher"]
