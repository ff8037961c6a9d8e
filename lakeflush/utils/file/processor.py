from lakeflush_spark.compat.files import FileProcessor

__all__ = ["FileProcessor"]
