from lakeflush_spark.compat.files import FileType

__all__ = ["FileType"]
