"""lakeflush_spark — a PySpark-native data-lake engine.

A from-scratch rebuild of the capabilities of the reference
``cloudindus-com/lakeflush`` project (small-file compaction for data
lakes: collect → bundle → flush, see ``/root/reference``), re-expressed
Spark-first and extended with a declared relational query surface plus
the operators a large-scale LLM training-data pipeline needs
(deduplication, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7):

- Everything is declared through the DataFrame / SQL API so Catalyst
  and Tungsten pick physical strategies (pushdown, pruning, AQE,
  whole-stage codegen). No hand-scheduled execution.
- The reference's Collector/Flusher daemon pair becomes a single Spark
  job (batch ``Trigger.AvailableNow`` or continuous Structured
  Streaming) — see :mod:`lakeflush_spark.operators.compaction`.
- Python UDFs are a last resort; where unavoidable they are
  Arrow-batched pandas UDFs.
"""

from lakeflush_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
