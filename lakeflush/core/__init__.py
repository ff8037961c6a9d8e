from lakeflush_spark.compat.core import Collector, Flusher

__all__ = ["Collector", "Flusher"]
