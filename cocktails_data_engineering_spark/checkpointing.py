"""Lineage truncation for iterative loops — local by default, durable on demand.

Every driver-side loop in this engine (``graph.bfs_min_depth``, PageRank,
``dedup.connected_components``, ``clustering.lloyd``, the crawl BFS) must
cut its plan per round or round N replays rounds 0..N-1.  Two mechanisms:

- ``localCheckpoint(eager=True)`` — blocks cached on executors.  Fast, no
  durable storage needed; the right default on ``local[*]`` and for short
  loops.  BUT the blocks die with their executor: on a 1000-executor
  cluster a single lost container kills a long iterative job.
- reliable ``checkpoint(eager=True)`` — blocks written to the checkpoint
  dir (HDFS/S3).  Survives executor loss; the right choice for long
  iterations at scale.

:func:`materialize` picks per-session: set ``spark.graft.checkpointDir``
(e.g. ``spark.conf.set("spark.graft.checkpointDir", "s3://bucket/ckpt")``)
and every loop in the engine switches to reliable checkpoints — no
per-operator flags.  Unset (the default), behavior is unchanged
``localCheckpoint``.

Usage (chains in place of ``.localCheckpoint(eager=True)``)::

    frontier = children.join(visited, "node", "left_anti").transform(materialize)
"""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel
from pyspark.sql import DataFrame

CHECKPOINT_DIR_CONF = "spark.graft.checkpointDir"


def materialize(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Uses reliable ``checkpoint()`` when ``spark.graft.checkpointDir`` is
    set on the session (setting the SparkContext checkpoint dir on first
    use), else eager ``localCheckpoint()``.
    """
    spark = df.sparkSession
    ckpt_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if ckpt_dir:
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def materialize_lazy(df: DataFrame) -> DataFrame:
    """:func:`materialize` that DEFERS computation to the first consumer
    action (optimization r14, guide §1.2/§2.4 "fewer jobs/barriers").

    ``localCheckpoint(eager=False)`` marks the plan's RDD for local
    checkpointing without running a job; the first action that computes
    it stores the blocks as a side effect (local checkpoints go through
    the caching subsystem, so partitions are persisted AS they are first
    computed), and every later consumer — in the same job or a later one
    — reads the stored blocks.  Lineage truncation and block reuse are
    identical to the eager form; the eager form just pays one extra
    driver-visible job per call site, which at sub-second query scale is
    pure fixed cost (the CC kernel paid 4 such setup jobs per invocation,
    the streaming dedup ingest paid them per micro-batch).

    Reliable-checkpoint mode (``spark.graft.checkpointDir`` set) keeps
    EAGER checkpoints: a non-eager reliable ``checkpoint()`` RECOMPUTES
    the whole plan in a second job when the checkpoint files are written
    (the classic checkpoint-without-cache gotcha) — exactly the double
    pay this helper exists to remove."""
    spark = df.sparkSession
    if spark.conf.get(CHECKPOINT_DIR_CONF, None):
        return materialize(df)
    return df.localCheckpoint(eager=False)


def materialize_big(df: DataFrame) -> DataFrame:
    """:func:`materialize` for intermediates whose row count scales with
    the INPUT (edge lists, candidate pairs at high duplication) rather
    than with clusters/labels/metadata.

    ``localCheckpoint``'s default storage holds the materialized blocks
    on the executor HEAP; a corpus-linear intermediate cached that way
    competes with shuffle buffers for the same memory and falls over
    exactly at scale (the 100× co-occurrence edge list is ~120M rows —
    eager heap caching OOMed a 8 GB local JVM, SCALE.md r12).  DISK_ONLY
    keeps the lineage cut and the reuse, costs one local spill/reload,
    and leaves the heap to the operators.  The reliable-checkpoint path
    (the 100 TB configuration) already writes to durable storage, so the
    distinction only matters for ``localCheckpoint``.
    """
    spark = df.sparkSession
    if spark.conf.get(CHECKPOINT_DIR_CONF, None):
        return materialize(df)
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


def materialize_big_lazy(df: DataFrame) -> DataFrame:
    """:func:`materialize_big`'s deferred form — DISK_ONLY local
    checkpoint blocks, stored by the first consuming action instead of a
    dedicated eager job (see :func:`materialize_lazy` for the mechanism
    and the reliable-checkpoint fallback)."""
    spark = df.sparkSession
    if spark.conf.get(CHECKPOINT_DIR_CONF, None):
        return materialize(df)
    return df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
