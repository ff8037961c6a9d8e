from lakeflush_spark.compat.utils import SQLiteMetastore

__all__ = ["SQLiteMetastore"]
