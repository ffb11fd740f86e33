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
