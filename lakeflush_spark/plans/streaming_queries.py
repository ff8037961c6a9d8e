"""Q34–Q36 — sessionization & true-streaming queries over ``events``.

q34: native ``session_window`` gap sessionization (batch mode, fully
oracled by a lag/cumsum SQL twin). q35: a REAL Structured Streaming
query (file source → watermark → tumbling window → memory sink,
Trigger.AvailableNow) whose complete-mode result must equal the batch
oracle — the batch-equivalence contract from SURVEY §7.3.6. q36: the
custom ``applyInPandasWithState`` sessionizer run in batch mode,
oracled against the same lag/cumsum SQL (session_end = last event,
no +gap padding).
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.io import load_table, table_path
from lakeflush_spark.plans.queries import declare
from lakeflush_spark.streaming.events import (
    SESSION_GAP_US,
    sessionize,
    sessionize_stateful,
    windowed_event_counts,
)

# lag/cumsum sessionization twin: new session when the gap to the
# previous event is >= the session gap (session_window merges
# half-open [ts, ts+gap) windows, so an exact-gap difference splits).
_SESSION_CTES = f"""
WITH e AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts,
           SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM e
)
"""


@declare(
    "q34_session_window",
    _SESSION_CTES
    + """
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    "Gap-based sessionization via native session_window (one shuffle on "
    "(user, merged-window); Spark merges sessions in state). The oracle "
    "rebuilds sessions with lag/cumsum.",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev).orderBy("user_id", "session_start")


@declare(
    "q35_streaming_tumbling",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           COUNT(*) AS cnt,
           round(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY window_start
    """,
    "TRUE streaming run: parquet file source -> watermark -> tumbling "
    "window -> memory sink (complete mode, Trigger.AvailableNow). The "
    "streamed result must equal the batch oracle exactly.",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream the events parquet through a real StreamingQuery
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":  # nanos -> TIMESTAMP_NTZ (io._fixup)
        stream = stream.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    agg = windowed_event_counts(stream)
    name = f"q35_sink_{uuid.uuid4().hex[:8]}"
    # The streaming state-store partition count is fixed by
    # spark.sql.shuffle.partitions at first checkpoint creation; under
    # the driver's PLAIN session that is Spark's default 200 — 200
    # state tasks per microbatch for a 720-group aggregate. Scope a
    # right-sized value around the run (fresh temp checkpoint every
    # call, so the override always applies) and restore after.
    orig = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    return spark.table(name).orderBy("window_start")


@declare(
    "q36_stateful_sessions",
    _SESSION_CTES
    + """
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    "Custom stateful sessionizer (applyInPandasWithState) in batch mode: "
    "per-key state machine over Arrow batches; oracled by the same "
    "lag/cumsum sessionization (session_end = last event).",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sessionize_stateful(ev).orderBy("user_id", "session_start")
