from lakeflush_spark.compat.s3 import S3Processor, S3Store

__all__ = ["S3Processor", "S3Store"]
