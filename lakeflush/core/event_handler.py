from lakeflush_spark.compat.handlers import FileRotationEventHandler

__all__ = ["FileRotationEventHandler"]
