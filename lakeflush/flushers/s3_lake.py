from lakeflush_spark.compat.flushers import S3LakeFlusher

__all__ = ["S3LakeFlusher"]
