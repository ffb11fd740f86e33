"""SparkSession factory.

The reference configures its "session" in ``WebSpider.__init__``
(``scripts/spiders/web_spider_oo.py:45-89``: HTTP session, retry policy,
blocklist).  Here the analogous lifecycle object is the SparkSession;
everything below is standard tuning for an analytics engine that must
scale from local[32] tests to a 1000-executor cluster:

- AQE on (runtime shuffle coalescing, skew-join splitting) so plans
  re-optimize with real statistics at any scale factor.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a
  real cluster AQE's coalescing makes the initial number far less
  critical than stock 200.
- Session timezone pinned to UTC so timestamp semantics are stable and
  comparable to external engines (DuckDB oracle, Postgres sinks).
- Arrow enabled for any pandas-UDF path (vector ops, multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def local_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "cocktails_spark_engine") -> SparkSession:
    """Build (or fetch) the shared local SparkSession."""
    cpus = local_cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[32] puts driver + all executor threads in ONE JVM: 32
        # concurrent tasks' execution memory, broadcast blocks, and
        # checkpoint storage share this heap.  8g measurably thrashed at
        # the 100× scale tier (GCLocker retry OOMs on repeated heavy
        # dedup invocations, SCALE.md r12) on a 128 GiB host; 16g is
        # still a small fraction of the box and sizes ~0.5g per task
        # slot, the usual executor-memory floor per core.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # UI off by default (port + heap overhead on a shared host); the
        # shuffle-bytes audit (tools/shuffle_bytes.py) flips it on to read
        # per-stage metrics from the status REST API.
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    # Durable index side-store (caching.get_or_build_tables): opt-in via
    # env so a deployment can point every session at one index directory
    # (fresh sessions then LOAD the IVF/PQ artifacts instead of paying
    # the corpus-scale build in-line with their first retrieval query).
    index_dir = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if index_dir:
        builder = builder.config("spark.graft.indexDir", index_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
