from lakeflush_spark.compat.handlers import GzipSizedTimedRotatingFileHandler

__all__ = ["GzipSizedTimedRotatingFileHandler"]
