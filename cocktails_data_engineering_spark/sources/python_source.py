"""Custom connector via the Python DataSource API (Spark 4).

The reference's ingestion is a bespoke source: a crawler that yields rows
into the engine (``scripts/spiders/web_spider_oo.py`` — requests in, DataFrame
out).  Spark's first-class answer is the Python DataSource API: implement
``DataSource`` / ``DataSourceReader``, register it on the session, and the
source becomes a parallel, partitioned scan any query can read with
``spark.read.format(name)`` — the extension point a team uses to wrap an
internal feed (a crawler frontier, a queue, an RPC service) as a table.

The demo source here is deterministic (md5-derived columns from the row id),
so the full connector path — partition planning, per-partition generation,
Catalyst aggregation on top — is DuckDB-oracle-checked: the oracle recomputes
the same rows arithmetically with ``range()``.

Scale: ``partitions()`` splits the id space into equal shards, one reader
task each — the source parallelizes like any file scan.  Generation is
per-partition Python (the API's contract); everything ABOVE the scan stays
JVM/Catalyst, which is the right boundary for a connector.
"""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..registry import register

SYNTH_ROWS = 20_000
SYNTH_PARTS = 8
_KINDS = ("alpha", "beta", "gamma", "delta")


def _row(i: int) -> tuple[int, str, int]:
    h = hashlib.md5(str(i).encode()).hexdigest()
    return i, _KINDS[int(h[0], 16) % 4], int(h[1:9], 16) % 1000


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthFeedDataSource(DataSource):
    """``spark.read.format("cocktails_synth")`` — deterministic feed."""

    @classmethod
    def name(cls) -> str:
        return "cocktails_synth"

    def schema(self) -> str:
        return "id BIGINT, kind STRING, val BIGINT"

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader(
            int(self.options.get("rows", SYNTH_ROWS)),
            int(self.options.get("parts", SYNTH_PARTS)),
        )


class _SynthReader(DataSourceReader):
    def __init__(self, rows: int, parts: int):
        self.rows, self.parts = rows, parts

    def partitions(self):
        step = (self.rows + self.parts - 1) // self.parts
        return [
            _IdRange(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _IdRange):
        # Arrow-batch contract (the scale path): yielding pyarrow.RecordBatch
        # instead of per-row tuples keeps generation vectorized and skips the
        # per-row pickle serializer — at 100 TB a connector that emits rows
        # one Python object at a time IS the bottleneck; one that emits
        # columnar batches parallelizes like a file scan.
        import pyarrow as pa

        batch_rows = 8192
        for lo in range(partition.start, partition.end, batch_rows):
            hi = min(lo + batch_rows, partition.end)
            rows = [_row(i) for i in range(lo, hi)]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.int64()),
                    pa.array([r[1] for r in rows], pa.string()),
                    pa.array([r[2] for r in rows], pa.int64()),
                ],
                names=["id", "kind", "val"],
            )


_REGISTERED = set()
_SINK_COUNTER = itertools.count()


def synth_feed(spark: SparkSession, rows: int = SYNTH_ROWS) -> DataFrame:
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(SynthFeedDataSource)
        _REGISTERED.add(key)
    return (
        spark.read.format("cocktails_synth")
        .option("rows", str(rows))
        .option("parts", str(SYNTH_PARTS))
        .load()
    )


_ORACLE_H = "md5(CAST(i AS VARCHAR))"


@register(
    "python_datasource_scan",
    oracle=f"""
WITH rows AS (
  SELECT i,
         ['alpha', 'beta', 'gamma', 'delta']
           [1 + CAST(('0x' || substr({_ORACLE_H}, 1, 1)) AS BIGINT) % 4] AS kind,
         CAST(('0x' || substr({_ORACLE_H}, 2, 8)) AS BIGINT) % 1000 AS val
  FROM (SELECT unnest(range(0, {SYNTH_ROWS})) AS i)
)
SELECT kind, COUNT(*) AS n_rows,
       CAST(SUM(val) AS BIGINT) AS sum_val,
       CAST(MIN(i) AS BIGINT) AS min_id, CAST(MAX(i) AS BIGINT) AS max_id
FROM rows GROUP BY kind
""",
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom-connector read: scan the registered Python
    DataSource ({SYNTH_PARTS} parallel partitions over {SYNTH_ROWS}
    deterministic rows) and aggregate per kind on top — proving the
    connector's partition planning and row generation feed Catalyst
    exactly like a native source.  The oracle regenerates the same rows
    arithmetically, so a value match certifies the whole connector path.
    """
    feed = synth_feed(spark)
    return feed.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val").alias("sum_val"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# Streaming Python DataSource (Spark 4 SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------
STREAM_ROWS = 5_000
# Rows per micro-batch => 2 offset-committed availableNow runs to drain.
# Each run is a full query start/stop (~2 s of fixed overhead), so the
# chunk size trades per-run cost against how many commit/recover cycles
# the connector test exercises; two runs still prove the replay contract.
STREAM_CHUNK = 2_500


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked reader over the same deterministic row generator:
    each micro-batch advances ``pos`` by STREAM_CHUNK until STREAM_ROWS,
    then reports no progress (a drained feed).  ``readBetweenOffsets``
    regenerates any committed range exactly — the replay contract that
    makes the source exactly-once under checkpoint recovery."""

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + STREAM_CHUNK, STREAM_ROWS)
        return iter([_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["pos"]), int(end["pos"]))])


class SynthStreamDataSource(DataSource):
    """``spark.readStream.format("cocktails_synth_stream")`` — the
    crawler-frontier-as-stream shape: a bespoke feed surfaced as a
    first-class streaming source with offsets, replay, and checkpoint
    recovery, not a driver-side loop pushing rows."""

    @classmethod
    def name(cls) -> str:
        return "cocktails_synth_stream"

    def schema(self) -> str:
        return "id BIGINT, kind STRING, val BIGINT"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthStreamReader()


@register(
    "stream_python_datasource_agg",
    oracle=f"""
WITH rows AS (
  SELECT i,
         ['alpha', 'beta', 'gamma', 'delta']
           [1 + CAST(('0x' || substr({_ORACLE_H}, 1, 1)) AS BIGINT) % 4] AS kind,
         CAST(('0x' || substr({_ORACLE_H}, 2, 8)) AS BIGINT) % 1000 AS val
  FROM (SELECT unnest(range(0, {STREAM_ROWS})) AS i)
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(val) AS BIGINT) AS sum_val,
       CAST(MAX(i) AS BIGINT) AS max_id
FROM rows GROUP BY kind
""",
)
def stream_python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CUSTOM STREAMING connector: the Python DataSource's
    SimpleDataSourceStreamReader feeds Structured Streaming
    (complete-mode per-kind aggregate in a memory sink), drained by
    repeated ``availableNow`` runs over ONE persistent checkpoint.
    Proves the full streaming-connector path — initialOffset → read →
    commit → replay contract — with the same arithmetic oracle as the
    batch scan, plus checkpoint RECOVERY: each run is a fresh query that
    resumes from the committed offset of the last.

    Drain mechanics: Spark's availableNow wrapper for Python simple
    stream readers falls back to single-batch execution (one prefetched
    ``read`` call = one {STREAM_CHUNK}-row chunk per run), so one run
    does NOT drain the feed — the loop below runs until the aggregate
    saturates at {STREAM_ROWS} rows, each run terminating
    deterministically via awaitTermination (no processing-time polling,
    no empty micro-batches rewriting the sink after drain).

    Scale: a real deployment points this at a crawl frontier / queue; the
    simple-reader API batches on the driver, the PARTITIONED stream
    reader API is the fan-out upgrade — the aggregation plan on top is
    identical either way."""
    import shutil
    import tempfile

    key = ("stream", id(spark))
    if key not in _REGISTERED:
        spark.dataSource.register(SynthStreamDataSource)
        _REGISTERED.add(key)
    feed = spark.readStream.format("cocktails_synth_stream").load()
    agg = feed.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("val").cast("bigint").alias("sum_val"),
        F.max("id").cast("bigint").alias("max_id"),
    )
    # Monotonic counter, not id(spark): a sink name derived from the session
    # object outlives q.stop() in the memory catalog and would collide on a
    # later call in the same session.
    name = f"stream_pyds_{next(_SINK_COUNTER)}"
    ckpt = tempfile.mkdtemp(prefix="cde_stream_pyds_ckpt_")
    n_chunks = (STREAM_ROWS + STREAM_CHUNK - 1) // STREAM_CHUNK
    got = 0
    try:
        for _ in range(n_chunks + 2):  # +2 slack for an uncommitted tail
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                if not q.awaitTermination(120):
                    raise TimeoutError("availableNow run did not terminate")
            finally:
                q.stop()
            if q.exception() is not None:
                raise q.exception()
            got = spark.sql(
                f"SELECT COALESCE(SUM(n_rows), 0) AS n FROM {name}"
            ).collect()[0].n
            if got >= STREAM_ROWS:
                break
        else:
            raise TimeoutError(f"stream drained only {got}/{STREAM_ROWS} rows")
        from ..checkpointing import materialize

        return materialize(spark.table(name))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
