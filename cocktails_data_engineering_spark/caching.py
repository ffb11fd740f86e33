"""Session-scoped artifact cache — one discipline for every expensive
derived table the engine reuses across queries — plus an optional
DURABLE parquet side-store so a *fresh session* can serve a previously
built index instead of retraining it.

Several query families pay a corpus-scale "index build" before the part
the user actually asked for: the 128-perm MinHash signature table behind
the banding planners, the PQ codebook + corpus codes behind the IVFADC
retrieval heads, the coarse IVF centroids.  Each is a DETERMINISTIC
function of (fixture dir, table fingerprint) — rebuilding it per query
invocation multiplies wall-clock at scale while adding zero information
(SCALE.md r11 measured 91–150 s per IVF/PQ head at 100×, most of it
retraining the same codebook).  A real deployment builds the index once,
PERSISTS it, and serves many queries from it; the session cache is the
in-memory half of that shape, the side-store the on-disk half.

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
- **Builders run once per key, concurrently across keys.**  A global
  lock guards only dict access; each key gets its own re-entrant build
  lock, so concurrent query threads can't race two corpus-scale builds
  of the SAME artifact while builds of DISTINCT artifacts proceed in
  parallel (ADVICE r12: the old single module lock serialized e.g.
  dedup_detector_agreement's four driver threads behind an unrelated
  ~115 s index build).  Per-key locks stay re-entrant so a builder may
  itself call :func:`get_or_build` for a sub-artifact (residual PQ
  builds on the coarse-quantizer entry — a different key, a different
  lock, so nesting can't self-deadlock either way).
- **A miss is a sentinel, not None** (ADVICE r12): a builder that
  legitimately returns ``None`` is cached like any other value instead
  of silently rebuilding on every call.
- **clear() unpersists** (ADVICE r12): dropping the dict references
  alone leaves the checkpointed blocks to the JVM ContextCleaner's GC
  cadence, transiently doubling checkpoint residency on clear+rebuild
  cycles; clear walks the values (including dict-valued artifacts) and
  best-effort ``unpersist()``-es every DataFrame first.

Durable side-store (:func:`get_or_build_tables`):

Artifacts whose values are dicts of DataFrames (the IVF/PQ index family)
can additionally be written through to parquet under the directory named
by the ``spark.graft.indexDir`` session conf, keyed by a digest of the
cache key (which embeds the fixture fingerprint, so a rewritten fixture
gets a different store entry rather than serving stale tables).  Unset
(the default) the behavior is the pure session cache.  Set, the first
build in ANY process writes the artifact tables atomically
(write to a temp dir, fs rename, ``_COMPLETE`` marker) and every later
session — including a brand-new process — LOADS the parquet instead of
retraining (VERDICT r12 #2: a fresh session paid the full ~115 s
codebook training + corpus encode in-line with its first retrieval
query at 100×).  Loaded artifacts are plain parquet scans: column-pruned
and pushdown-friendly, and they occupy no executor heap, unlike the
localCheckpoint blocks they replace.  Every stored artifact is a
deterministic function of the fixture and every consumer is
row-order-insensitive (the oracles hash sorted values), so serving the
store is bit-identical to rebuilding.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from typing import Callable, Hashable, TypeVar

from pyspark.sql import DataFrame, SparkSession

T = TypeVar("T")

_ATTR = "_cde_artifact_cache"
_LOCKS_ATTR = "_cde_artifact_locks"
_DICT_LOCK = threading.Lock()  # guards cache/lock-dict ACCESS only, never builds
_MISS = object()

STORE_DIR_CONF = "spark.graft.indexDir"


def _dicts(spark: SparkSession) -> tuple[dict, dict]:
    """The (cache, per-key-lock) dicts for this session, creating both
    under the global dict lock on first touch."""
    cache = getattr(spark, _ATTR, None)
    locks = getattr(spark, _LOCKS_ATTR, None)
    if cache is None or locks is None:
        with _DICT_LOCK:
            cache = getattr(spark, _ATTR, None)
            if cache is None:
                cache = {}
                setattr(spark, _ATTR, cache)
            locks = getattr(spark, _LOCKS_ATTR, None)
            if locks is None:
                locks = {}
                setattr(spark, _LOCKS_ATTR, locks)
    return cache, locks


def get_or_build(spark: SparkSession, key: Hashable, builder: Callable[[], T]) -> T:
    """Return the cached artifact for ``key`` on this session, building
    (and memoizing) it with ``builder`` on first use.  The build runs
    under a per-key lock: concurrent callers for the same key wait for
    one build; callers for distinct keys build concurrently."""
    cache, locks = _dicts(spark)
    with _DICT_LOCK:
        got = cache.get(key, _MISS)
        if got is not _MISS:
            return got
        key_lock = locks.setdefault(key, threading.RLock())
    with key_lock:
        with _DICT_LOCK:
            got = cache.get(key, _MISS)
            if got is not _MISS:
                return got
        val = builder()
        with _DICT_LOCK:
            cache[key] = val
        return val


def _unpersist_value(val: object) -> None:
    """Best-effort unpersist of every DataFrame reachable one level deep
    (artifact values are DataFrames or dicts of DataFrames)."""
    if isinstance(val, DataFrame):
        try:
            val.unpersist()
        except Exception:  # noqa: BLE001 — stopped context, already freed
            pass
    elif isinstance(val, dict):
        for sub in val.values():
            _unpersist_value(sub)


def clear(spark: SparkSession) -> None:
    """Drop every cached artifact on this session (tests use this to
    force rebuilds under altered configs, e.g. shuffle parallelism),
    unpersisting cached DataFrames' blocks eagerly rather than leaving
    them to ContextCleaner GC."""
    with _DICT_LOCK:
        cache = getattr(spark, _ATTR, None)
        values = list(cache.values()) if cache else []
        if cache is not None:
            cache.clear()
        locks = getattr(spark, _LOCKS_ATTR, None)
        if locks is not None:
            locks.clear()
    for val in values:
        _unpersist_value(val)


# ---------------------------------------------------------------------------
# Durable parquet side-store for dict-of-DataFrame artifacts
# ---------------------------------------------------------------------------
def _store_path(spark: SparkSession, key: Hashable) -> str | None:
    root = spark.conf.get(STORE_DIR_CONF, None)
    if not root:
        return None
    digest = hashlib.sha256(repr(key).encode("utf-8")).hexdigest()[:24]
    return os.path.join(root, digest)


def _load_stored(spark: SparkSession, path: str, key: Hashable) -> dict | None:
    """Load a completed store entry, verifying the full key repr (the
    path is a truncated digest; the marker carries the whole key)."""
    marker = os.path.join(path, "_COMPLETE")
    try:
        with open(marker, "r", encoding="utf-8") as fh:
            meta = json.load(fh)
    except (OSError, ValueError):
        return None
    if meta.get("key") != repr(key):
        return None
    return {
        name: spark.read.parquet(os.path.join(path, name))
        for name in meta["tables"]
    }


def _write_store(spark: SparkSession, path: str, key: Hashable, built: dict) -> None:
    """Atomically publish ``built``'s tables: write every component into
    a temp sibling, stamp the marker, rename into place.  A concurrent
    publisher losing the rename race defers to the winner."""
    tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
    for name, df in built.items():
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))
    with open(os.path.join(tmp, "_COMPLETE"), "w", encoding="utf-8") as fh:
        json.dump({"key": repr(key), "tables": sorted(built)}, fh)
    try:
        os.rename(tmp, path)
    except OSError:
        # another process published first; keep theirs, drop ours
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def get_or_build_tables(
    spark: SparkSession, key: Hashable, builder: Callable[[], dict]
) -> dict:
    """:func:`get_or_build` for dict-of-DataFrame artifacts with durable
    write-through: when ``spark.graft.indexDir`` is set, a completed
    store entry is LOADED instead of built, and a fresh build is
    published to the store then re-served as parquet scans (freeing the
    build's checkpoint blocks — the served copy lives on disk, not the
    executor heap)."""

    def _load_or_build() -> dict:
        path = _store_path(spark, key)
        if path is not None:
            stored = _load_stored(spark, path, key)
            if stored is not None:
                return stored
        built = builder()
        if path is not None:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            _write_store(spark, path, key, built)
            stored = _load_stored(spark, path, key)
            if stored is not None:
                for df in built.values():
                    _unpersist_value(df)
                return stored
        return built

    return get_or_build(spark, key, _load_or_build)
