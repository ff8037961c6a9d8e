from lakeflush_spark.compat.core import Collector

__all__ = ["Collector"]
