from lakeflush_spark.compat.utils import MetaDataKey

__all__ = ["MetaDataKey"]
