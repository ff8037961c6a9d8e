from lakeflush_spark.compat.files import CSVFileReader, JSONFileReader

__all__ = ["CSVFileReader", "JSONFileReader"]
