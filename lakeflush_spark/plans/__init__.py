from lakeflush_spark.plans.queries import QUERIES, DeclaredQuery

# Importing registers the declared queries in QUERIES.
from lakeflush_spark.plans import compaction_queries as _compaction_queries  # noqa: F401
from lakeflush_spark.plans import text_queries as _text_queries  # noqa: F401
from lakeflush_spark.plans import dedup_queries as _dedup_queries  # noqa: F401
from lakeflush_spark.plans import decontam_queries as _decontam_queries  # noqa: F401
from lakeflush_spark.plans import similarity_queries as _similarity_queries  # noqa: F401
from lakeflush_spark.plans import multimodal_queries as _multimodal_queries  # noqa: F401
from lakeflush_spark.plans import streaming_queries as _streaming_queries  # noqa: F401
from lakeflush_spark.plans import relational_ext_queries as _relational_ext_queries  # noqa: F401
from lakeflush_spark.plans import relational_ext3_queries as _relational_ext3_queries  # noqa: F401
from lakeflush_spark.plans import udf_queries as _udf_queries  # noqa: F401

# r13: builders that localize their (small) result for driver-hash
# observability expose the underlying LAZY plan here, so plan audits
# (tests/test_plans.py, scripts/explain_audit.py) still gate the real
# distributed shape instead of a LocalTableScan.
PLAN_FRAMES = {
    "q41_wordcount_topk": _relational_ext_queries.q41_suite_frame,
}

__all__ = ["QUERIES", "DeclaredQuery", "PLAN_FRAMES"]
