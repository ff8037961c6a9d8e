from lakeflush_spark.compat.utils import Logger

__all__ = ["Logger"]
