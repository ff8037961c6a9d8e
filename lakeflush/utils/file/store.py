from lakeflush_spark.compat.files import FileStore

__all__ = ["FileStore"]
