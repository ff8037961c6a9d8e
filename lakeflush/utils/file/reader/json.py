from lakeflush_spark.compat.files import JSONFileReader

__all__ = ["JSONFileReader"]
