from lakeflush_spark.compat.handlers import SizedTimedRotatingFileHandler

__all__ = ["SizedTimedRotatingFileHandler"]
