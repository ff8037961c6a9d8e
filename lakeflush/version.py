from lakeflush_spark.version_compat import VERSION_BUILD, VERSION_MAJOR, VERSION_MINOR

__all__ = ["VERSION_MAJOR", "VERSION_MINOR", "VERSION_BUILD"]
