"""Per-SparkContext memoization for expensive-to-build Column expressions.

Large unrolled expression trees (the synthetic payload, the URL
canonicalizer) cost 0.1–1.2 s of py4j round-trips PER CONSTRUCTION on
this box — driver-serial time charged to every crawl round and to the
N-vs-4N scaling criterion's serial span. Column objects are immutable
and re-resolve by name at analysis time, so one instance can be reused
across any number of DataFrames within a SparkContext; entries keyed to
a dead context (stale JVM refs) are dropped on the next build.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")

_CACHE: dict[tuple, Any] = {}
# CrawlEngine invokes cached builders from its commit thread pool
# (ADVICE r5 #3): the lookup / stale-eviction / insert steps mutate _CACHE
# concurrently, so they run under a lock. The build itself runs OUTSIDE
# the lock (py4j round-trips up to ~1 s — two threads racing the same key
# waste one build, which setdefault-style insertion tolerates; holding the
# lock across the build would serialize unrelated expressions).
_LOCK = threading.Lock()


def cached_expr(tag: str, builder: Callable[[], T], *key_parts: Any) -> T:
    """Return `builder()` memoized on (current applicationId, tag,
    *key_parts). `key_parts` must capture every parameter the built
    expression depends on. Thread-safe (double-checked insert)."""
    sess = SparkSession.getActiveSession()
    app = sess.sparkContext.applicationId if sess is not None else None
    key = (app, tag, *key_parts)
    with _LOCK:
        if key in _CACHE:
            return _CACHE[key]
        for k in [k for k in _CACHE if k[0] != app]:
            _CACHE.pop(k, None)
    val = builder()
    with _LOCK:
        return _CACHE.setdefault(key, val)
