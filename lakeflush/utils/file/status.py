from lakeflush_spark.compat.files import FileStatus

__all__ = ["FileStatus"]
