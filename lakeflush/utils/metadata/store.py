from lakeflush_spark.compat.utils import MetaDataStore

__all__ = ["MetaDataStore"]
