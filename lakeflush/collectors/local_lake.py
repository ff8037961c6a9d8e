from lakeflush_spark.compat.collectors import LocalLakeCollector

__all__ = ["LocalLakeCollector"]
