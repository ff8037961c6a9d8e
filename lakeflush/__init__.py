"""Import-compatible shim over :mod:`lakeflush_spark.compat`.

Lets code written against the reference package run unchanged::

    from lakeflush.collectors import LocalLakeCollector   # works as-is

Everything here is a re-export; the implementation is the Spark-first
engine in ``lakeflush_spark`` (see SURVEY.md §2.D for the parity map).
"""

from lakeflush_spark import __version__  # noqa: F401
