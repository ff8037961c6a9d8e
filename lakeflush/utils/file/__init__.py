from lakeflush_spark.compat.files import (
    FileProcessor,
    FileStatus,
    FileStore,
    FileType,
)

__all__ = ["FileStatus", "FileStore", "FileProcessor", "FileType"]
