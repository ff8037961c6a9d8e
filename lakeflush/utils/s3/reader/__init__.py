from lakeflush_spark.compat.s3 import S3CSVFileReader, S3JSONFileReader

__all__ = ["S3CSVFileReader", "S3JSONFileReader"]
