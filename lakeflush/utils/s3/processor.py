from lakeflush_spark.compat.s3 import S3Processor

__all__ = ["S3Processor"]
