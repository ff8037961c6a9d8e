from lakeflush_spark.compat.s3 import S3CSVFileReader

__all__ = ["S3CSVFileReader"]
