"""Event-stream operators: windows, watermarked dedup, sessionization.

The reference has no event-time notion at all (processing-time
partitions only, `lakeflush/flushers/local_lake.py:55-60`; SURVEY
§2.B streaming row). These operators add the standard event-time
toolkit. Each works on BOTH batch and streaming DataFrames — one
expression, two execution modes — which is exactly how the driver's
batch oracle can check streaming semantics (SURVEY §7.3.6).

Scale: windowed aggregates shuffle once on (window, keys); state size
is bounded by the watermark horizon. ``session_window`` merges are
Spark-native (codegen); the ``applyInPandasWithState`` variant below
exists to demonstrate the custom-stateful-operator shape for
semantics the built-ins can't express.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

DEFAULT_WATERMARK = "2 hours"
SESSION_GAP = "30 minutes"
SESSION_GAP_US = 30 * 60 * 1_000_000


def _maybe_watermark(events: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if events.isStreaming and watermark:
        # watermarks require TIMESTAMP (not NTZ); session tz is pinned
        # UTC (session.py) so the cast is value-preserving
        if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
            events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return events.withWatermark(ts_col, watermark)
    return events


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = DEFAULT_WATERMARK,
    slide: str | None = None,
) -> DataFrame:
    """Time-window count+sum (q14's expression; streaming-capable).

    ``slide=None`` -> tumbling; a slide duration makes it SLIDING
    (each event lands in window/slide overlapping windows; streaming
    state is (active windows x groups), bounded by the watermark)."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        _maybe_watermark(events, ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        # NTZ output regardless of the watermark cast (UTC session)
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "cnt", "sum_value")
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """dropDuplicates bounded by the watermark horizon (streaming state
    is evicted once the watermark passes — without it, exact streaming
    dedup needs unbounded state)."""
    return _maybe_watermark(events, ts_col, watermark).dropDuplicates(keys or ["event_id"])


def sessionize(
    events: DataFrame,
    gap: str = SESSION_GAP,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Gap-based sessionization via the native ``session_window``.

    Two events share a session iff their time difference is strictly
    less than ``gap`` (session_window merges overlapping
    [ts, ts+gap) intervals). Output: one row per (user, session) with
    start / end(=last event + gap) / event count. Shuffles once on
    (key, merged window); Spark merges sessions natively in state.
    """
    return (
        _maybe_watermark(events, ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            F.col("sw.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("count", LongType()),
    ]
)

_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stateful(
    events: DataFrame,
    gap_us: int = SESSION_GAP_US,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    Demonstrates the arbitrary-stateful-operator shape (per-key state
    dict, event-time timeout) for semantics ``session_window`` cannot
    express — e.g. emitting CLOSED sessions exactly once, with the
    session carried across micro-batches and closed either by a gap
    within a batch or by watermark timeout between batches.

    Batch-mode note: Spark rejects applyInPandasWithState on batch
    DataFrames, so batch input runs the same session split as a plain
    ``applyInPandas`` group-apply (all sessions close at end of input
    — equivalent to the session_window batch result, minus the +gap
    end padding).
    """
    import pandas as pd

    def _split_sessions(ts_us: list[int]) -> list[tuple[int, int, int]]:
        out: list[tuple[int, int, int]] = []
        cur_s = cur_e = cur_c = None
        for t in sorted(ts_us):
            if cur_s is None:
                cur_s, cur_e, cur_c = t, t, 1
            elif t - cur_e < gap_us:
                cur_e, cur_c = t, cur_c + 1
            else:
                out.append((cur_s, cur_e, cur_c))
                cur_s, cur_e, cur_c = t, t, 1
        if cur_s is not None:
            out.append((cur_s, cur_e, cur_c))
        return out

    def _frame(user_id: int, sessions: list[tuple[int, int, int]]) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "user_id": [int(user_id)] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [c for _, _, c in sessions],
            }
        )

    if not events.isStreaming:

        def batch_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
            ts_us = [int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])]
            return _frame(int(pdf["user_id"].iloc[0]), _split_sessions(ts_us))

        return events.groupBy("user_id").applyInPandas(batch_fn, _SESSION_OUT_SCHEMA)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s, e, c = state.get
                closed.append((s, e, c))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
            ts_us.sort()
            if state.exists:
                cur_s, cur_e, cur_c = state.get
            else:
                cur_s = cur_e = cur_c = None
            for t in ts_us:
                if cur_s is None:
                    cur_s, cur_e, cur_c = t, t, 1
                elif t - cur_e < gap_us:
                    cur_e, cur_c = t, cur_c + 1
                else:
                    closed.append((cur_s, cur_e, cur_c))
                    cur_s, cur_e, cur_c = t, t, 1
            if cur_s is not None:
                state.update((cur_s, cur_e, cur_c))
                try:
                    state.setTimeoutTimestamp((cur_e + gap_us) // 1000)
                except Exception:
                    # batch mode: timeouts unsupported -> close at end
                    closed.append((cur_s, cur_e, cur_c))
                    state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    src = _maybe_watermark(events, "ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
