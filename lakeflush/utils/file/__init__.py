from lakeflush_spark.compat.files import FileStatus, FileStore, FileType

__all__ = ["FileStatus", "FileStore", "FileType"]
