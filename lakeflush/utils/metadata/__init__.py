from lakeflush_spark.compat.utils import MetaDataKey, MetaDataStore

__all__ = ["MetaDataKey", "MetaDataStore"]
