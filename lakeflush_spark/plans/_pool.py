"""Shared module-level thread pool for overlapping independent eager
build jobs inside query builders (guide §2.6: Spark happily runs
several jobs at once; eager steps are only sequential because the
driver calls them sequentially — a small pool lets the next job's
stages back-fill the tail of the current one).

MODULE-LEVEL and long-lived on purpose: in py4j pinned-thread mode
every Python thread owns a dedicated JVM thread that outlives it
unless explicitly cleaned (pyspark.InheritableThread's reason to
exist) — a per-call pool leaks JVM threads at every build and
measurably degrades the rest of a long bench run (the q55 pool note,
r14).

Concurrency contract (r15, ADVICE r14): builders assume ONE builder
runs at a time per process. Pooled lambdas may call module-level
check-then-append memos (``_q60_fl_gen``, corpus_report internals)
whose worst case under concurrency is a DOUBLE BUILD of a pure,
idempotent Column tree — wasted work, never a wrong value — but the
assumption is recorded here: drivers that ever run two builders
concurrently should serialize the build calls themselves.
"""

from __future__ import annotations

from lakeflush_spark.io import eager_pool as plan_pool

__all__ = ["plan_pool"]
