from lakeflush_spark.compat.collectors import LocalLakeCollector, S3LakeCollector

__all__ = ["LocalLakeCollector", "S3LakeCollector"]
