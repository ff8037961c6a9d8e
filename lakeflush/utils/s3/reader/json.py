from lakeflush_spark.compat.s3 import S3JSONFileReader

__all__ = ["S3JSONFileReader"]
