"""Session-scoped artifact cache — one discipline for every expensive
derived table the engine reuses across queries.

Several query families pay a corpus-scale "index build" before the part
the user actually asked for: the 128-perm MinHash signature table behind
the banding planners, the PQ codebook + corpus codes behind the IVFADC
retrieval heads, the coarse IVF centroids.  Each is a DETERMINISTIC
function of (fixture dir, table fingerprint) — rebuilding it per query
invocation multiplies wall-clock at scale while adding zero information
(SCALE.md r11 measured 91–150 s per IVF/PQ head at 100×, most of it
retraining the same codebook).  A real deployment builds the index once
and serves many queries from it; this cache is that shape in-session.

Design:

- **Scope = the SparkSession object.**  The per-session dict lives as an
  attribute ON the session itself, not in a module global.  Cached
  DataFrames strongly reference their session, so a module-level
  ``WeakKeyDictionary`` keyed by session never evicts — its values keep
  the weak key alive forever (ADVICE r11).  As a session attribute the
  whole thing is an ordinary reference cycle (session → dict →
  DataFrame → session) that CPython's cycle collector reclaims the
  moment the session becomes unreachable; a sibling ``newSession()`` is
  a distinct object and gets its own cache, which also keeps any
  temp-view-based consumers session-local.
- **Keys must embed the fixture fingerprint**
  (:func:`..sources.tables.table_fingerprint`) so a rewritten fixture
  under the same path rebuilds instead of serving stale artifacts.
- **Builders run once.**  A module lock double-checks, so concurrent
  query threads on one session can't race two corpus-scale builds of
  the same artifact.  The lock is re-entrant: a builder may itself call
  :func:`get_or_build` for a sub-artifact (residual PQ builds on the
  coarse-quantizer entry).
"""

from __future__ import annotations

import threading
from typing import Callable, Hashable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")

_ATTR = "_cde_artifact_cache"
_LOCK = threading.RLock()


def get_or_build(spark: SparkSession, key: Hashable, builder: Callable[[], T]) -> T:
    """Return the cached artifact for ``key`` on this session, building
    (and memoizing) it with ``builder`` on first use."""
    cache = getattr(spark, _ATTR, None)
    if cache is not None:
        got = cache.get(key)
        if got is not None:
            return got
    with _LOCK:
        cache = getattr(spark, _ATTR, None)
        if cache is None:
            cache = {}
            setattr(spark, _ATTR, cache)
        got = cache.get(key)
        if got is None:
            got = builder()
            cache[key] = got
        return got


def clear(spark: SparkSession) -> None:
    """Drop every cached artifact on this session (tests use this to
    force rebuilds under altered configs, e.g. shuffle parallelism)."""
    with _LOCK:
        cache = getattr(spark, _ATTR, None)
        if cache is not None:
            cache.clear()
