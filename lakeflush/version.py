from lakeflush_spark.version_compat import (
    VERSION_BUILD,
    VERSION_INFO,
    VERSION_MAJOR,
    VERSION_MINOR,
    VERSION_STRING,
    __version__,
)

__all__ = [
    "VERSION_MAJOR",
    "VERSION_MINOR",
    "VERSION_BUILD",
    "VERSION_INFO",
    "VERSION_STRING",
    "__version__",
]
