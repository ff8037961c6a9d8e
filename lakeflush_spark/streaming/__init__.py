"""Structured Streaming surface: continuous compaction + event ops.

Replaces the reference's watchdog/inotify delivery daemon
(`lakeflush/core/flusher.py:48-67`) with a checkpointed streaming file
source — a strict upgrade per SURVEY §3.4: pre-existing files ARE
picked up (the reference never flushes bundles that rotated while the
flusher was down), listing is exactly-once across restarts, and
`Trigger.AvailableNow` gives catch-up batch semantics on the same code
path as continuous `processingTime` operation.
"""

from lakeflush_spark.streaming.compaction import (  # noqa: F401
    StreamCompactionConfig,
    compact_stream,
)
from lakeflush_spark.streaming.curation import (  # noqa: F401
    CurationStreamConfig,
    curate_stream,
    read_stats,
)
from lakeflush_spark.streaming.dedup import (  # noqa: F401
    StreamDedupConfig,
    StreamNearDupConfig,
    compact_store,
    dedup_stream,
    list_runs,
    near_dup_stream,
    open_file_stream,
    vacuum_runs,
)
from lakeflush_spark.streaming.phash import (  # noqa: F401
    StreamPhashConfig,
    phash_dedup_stream,
)
from lakeflush_spark.streaming.retrieval import (  # noqa: F401
    StreamIndexConfig,
    StreamVecIndexConfig,
    bm25_index_stream,
    ivf_index_stream,
)
from lakeflush_spark.streaming.semdedup import (  # noqa: F401
    StreamSemDedupConfig,
    compact_vec_store,
    retrain_quantizer,
    semdedup_stream,
)
from lakeflush_spark.streaming.substring import (  # noqa: F401
    StreamBoilerplateConfig,
    boilerplate_stream,
    compact_fp_store,
)
from lakeflush_spark.streaming.events import (  # noqa: F401
    dedup_within_watermark,
    sessionize,
    sessionize_stateful,
    windowed_event_counts,
)
