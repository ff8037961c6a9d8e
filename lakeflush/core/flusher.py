from lakeflush_spark.compat.core import Flusher

__all__ = ["Flusher"]
