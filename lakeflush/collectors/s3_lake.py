from lakeflush_spark.compat.collectors import S3LakeCollector

__all__ = ["S3LakeCollector"]
