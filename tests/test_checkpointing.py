"""The durable-checkpoint switch: with spark.graft.checkpointDir set,
iterative loops write reliable checkpoints (survive executor loss at
scale) and produce the identical result as the localCheckpoint default."""

from __future__ import annotations

import os

import pytest

from cocktails_data_engineering_spark.checkpointing import (
    CHECKPOINT_DIR_CONF,
    materialize,
)
from cocktails_data_engineering_spark.operators.graph import bfs_crawl_sim


@pytest.fixture()
def ckpt_conf(spark, tmp_path):
    """Set the checkpoint-dir conf for one test; always unset after (the
    spark fixture is session-scoped and other tests expect the default)."""
    d = str(tmp_path / "ckpt")
    spark.conf.set(CHECKPOINT_DIR_CONF, d)
    try:
        yield d
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)


def test_materialize_local_by_default(spark):
    assert spark.conf.get(CHECKPOINT_DIR_CONF, None) is None
    df = materialize(spark.range(5))
    assert df.count() == 5


def test_materialize_writes_reliable_checkpoint(spark, ckpt_conf):
    df = materialize(spark.range(10))
    assert df.count() == 10
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(ckpt_conf)
        for f in fs
    ]
    assert files, "reliable checkpoint produced no files in the configured dir"


def test_bfs_identical_under_reliable_checkpoint(spark, sf_dir, ckpt_conf):
    durable = sorted(map(tuple, bfs_crawl_sim(spark, sf_dir).collect()))
    spark.conf.unset(CHECKPOINT_DIR_CONF)
    local = sorted(map(tuple, bfs_crawl_sim(spark, sf_dir).collect()))
    assert durable == local
