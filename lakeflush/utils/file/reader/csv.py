from lakeflush_spark.compat.files import CSVFileReader

__all__ = ["CSVFileReader"]
