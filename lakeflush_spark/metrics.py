"""Pipeline metrics — the reference's ``MetaDataStore`` counters
(`lakeflush/utils/metadata/store.py:5-23`, keys collected/flushed/
errored at `utils/metadata/key.py:4-7`) — except the reference never
increments them anywhere (dead, SURVEY §1.4/O16). Here they are live:

- batch: ``F.observe`` accumulators evaluated inside the job (no extra
  pass over the data, metrics ride the existing plan);
- streaming: a ``StreamingQueryListener`` folding per-batch progress
  rows into the same counter names.

Counters are plan-side aggregates, so they scale for free — no
driver-side iteration, no second job.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession


@dataclass
class PipelineMetrics:
    """Live counters keyed like the reference's MetaDataStore."""

    collected: int = 0
    flushed: int = 0
    errored: int = 0
    bytes_collected: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def add(self, collected: int = 0, flushed: int = 0, errored: int = 0, nbytes: int = 0):
        with self._lock:
            self.collected += collected
            self.flushed += flushed
            self.errored += errored
            self.bytes_collected += nbytes


def observe_collected(df: DataFrame, text_col: str = "value") -> tuple[DataFrame, Observation]:
    """Attach row/byte counters to a plan; read them after the action.

    Usage::

        df, obs = observe_collected(df)
        df.write...
        metrics.add(collected=obs.get["rows"], nbytes=obs.get["bytes"])
    """
    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.length(text_col) + 1), F.lit(0)).alias("bytes"),
    )
    return observed, obs


class StreamMetricsListener:
    """Fold streaming progress into PipelineMetrics (one listener per
    session; counts input rows across all queries it observes)."""

    def __init__(self, spark: SparkSession, metrics: PipelineMetrics):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                outer.metrics.add(collected=int(event.progress.numInputRows), flushed=1)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.metrics = metrics
        self._listener = _L()
        self._spark = spark
        spark.streams.addListener(self._listener)

    def remove(self) -> None:
        self._spark.streams.removeListener(self._listener)
