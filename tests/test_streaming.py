"""Streaming semantics: the foreachBatch route and the memory-sink route
must both reproduce the batch plan's result exactly (the VERDICT's
docstring-claims-made-true test)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.relational import tumbling_window_agg
from cocktails_data_engineering_spark.sources.tables import load
from cocktails_data_engineering_spark.streaming.events import (
    read_events_stream,
    run_foreach_batch,
    stream_user_event_counts,
    tumbling_plan,
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_foreach_batch_matches_batch_plan(spark, sf_dir):
    batch = _canon(tumbling_window_agg(spark, sf_dir).toPandas())
    batches = run_foreach_batch(tumbling_plan(read_events_stream(spark, sf_dir)))
    assert batches, "no micro-batches produced"
    final = _canon(batches[-1])  # complete mode: last batch is the full result
    pd.testing.assert_frame_equal(batch, final)


def test_stateful_counts_match_groupby(spark, sf_dir):
    from cocktails_data_engineering_spark.sources.tables import load

    stream_counts = _canon(stream_user_event_counts(spark, sf_dir).toPandas())
    batch_counts = _canon(
        load(spark, sf_dir, "events").groupBy("user_id").count()
        .withColumnRenamed("count", "n_events").toPandas()
    )
    pd.testing.assert_frame_equal(stream_counts, batch_counts)


def test_stream_session_window_matches_batch(spark, sf_dir):
    """The streaming session-window result (availableNow, run to
    completion) must equal the batch session_window_agg exactly."""
    from cocktails_data_engineering_spark.operators.relational import session_window_agg
    from cocktails_data_engineering_spark.streaming.events import (
        stream_session_window_agg,
    )

    batch = {tuple(r) for r in session_window_agg(spark, sf_dir).collect()}
    stream = {tuple(r) for r in stream_session_window_agg(spark, sf_dir).collect()}
    assert stream == batch


def test_foreachbatch_upsert_runs_multibatch_and_matches_batch(spark, sf_dir):
    """The staged backlog must split into ≥ 2 micro-batches (otherwise the
    incremental-merge claim is vacuous), and the merged state must equal
    the one-shot batch aggregate bit-for-bit."""
    from cocktails_data_engineering_spark.functions.numerics import dsum
    from cocktails_data_engineering_spark.streaming import events as se

    result = {tuple(r) for r in se.stream_foreachbatch_upsert(spark, sf_dir).collect()}
    assert se.LAST_UPSERT_BATCH_COUNT[0] >= 2

    batch = {
        tuple(r)
        for r in load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .collect()
    }
    assert result == batch


def test_stream_mixture_sample_equals_batch(spark, sf_dir):
    """The streamed mixture sample must equal the batch sample's per-lang
    kept counts exactly (deterministic hash ⇒ no stream/batch skew)."""
    from cocktails_data_engineering_spark.operators.curation import (
        domain_mixture_sample,
    )
    from cocktails_data_engineering_spark.streaming.events import (
        stream_mixture_sample,
    )

    streamed = {r.lang: r.n_kept for r in stream_mixture_sample(spark, sf_dir).collect()}
    batch = {
        r.lang: r.n_kept
        for r in domain_mixture_sample(spark, sf_dir).collect()
        if r.n_kept > 0
    }
    assert streamed == batch


def test_stream_psi_drift_flags_match_threshold(spark, sf_dir):
    from cocktails_data_engineering_spark.streaming.events import (
        PSI_ALERT,
        stream_psi_drift,
    )

    rows = stream_psi_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.psi >= 0.0
        assert r.is_drift == (1 if r.psi >= PSI_ALERT else 0)


def test_stream_user_spend_tws_matches_batch(spark, sf_dir):
    """Per-user spend state machine: state-v2 (transformWithStateInPandas)
    where the worker-side protobuf dependency exists, the
    applyInPandasWithState fallback twin otherwise — the query runs (and
    registers) on BOTH paths, so this asserts whichever path the
    environment takes against the batch aggregate."""
    import pyspark.sql.functions as F

    from cocktails_data_engineering_spark.functions.numerics import dsum
    from cocktails_data_engineering_spark.sources.tables import load
    from cocktails_data_engineering_spark.streaming.events import (
        stream_user_spend_tws,
    )

    got = {
        r.user_id: (r.n_purchases, r.total_value)
        for r in stream_user_spend_tws(spark, sf_dir).collect()
    }
    want = {
        r.user_id: (r.n_purchases, r.total_value)
        for r in load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(dsum(F.col("value")), 6).alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_tws_state_v2_and_v1_fallback_agree(spark, sf_dir, monkeypatch):
    """Differential check of the TWO arbitrary-stateful paths: the true
    transformWithStateInPandas (state API v2) run vs the
    applyInPandasWithState fallback twin, row for row.  Skipped where the
    Python workers lack protobuf (the state-v2 runner's dependency) —
    green in capable environments, so the fallback twin can never drift
    from the real path unnoticed (VERDICT r8 #6)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from cocktails_data_engineering_spark.streaming import events as ev

    assert ev._HAS_STATE_V2_DEPS  # probe must agree with the import
    v2 = {
        r.user_id: (r.n_purchases, r.total_value)
        for r in ev.stream_user_spend_tws(spark, sf_dir).collect()
    }
    monkeypatch.setattr(ev, "_HAS_STATE_V2_DEPS", False)
    v1 = {
        r.user_id: (r.n_purchases, r.total_value)
        for r in ev.stream_user_spend_tws(spark, sf_dir).collect()
    }
    assert v2 == v1


def test_checkpoint_restart_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once resume across process-style restarts: run an
    availableNow pass over file A with a checkpoint, then add file B and
    run a NEW query on the SAME checkpoint — the second run must process
    only B (no reprocessing, no loss), and the merged totals must equal
    the batch aggregate over A+B."""
    import shutil

    import pyspark.sql.functions as F

    from cocktails_data_engineering_spark.sources.tables import load

    events = load(spark, sf_dir, "events")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)

    stage = tmp_path / "stage"
    ckpt = str(tmp_path / "ckpt")
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    half_a.coalesce(1).write.parquet(str(a_dir))
    half_b.coalesce(1).write.parquet(str(b_dir))
    stage.mkdir()
    for f in a_dir.glob("*.parquet"):
        shutil.copy(f, stage / f"a_{f.name}")

    schema = events.schema
    seen_rows: list[int] = []
    totals: dict[int, int] = {}

    def fold(batch_df, batch_id):
        rows = batch_df.groupBy("user_id").count().collect()
        seen_rows.append(sum(r["count"] for r in rows))
        for r in rows:
            totals[r.user_id] = totals.get(r.user_id, 0) + r["count"]

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(stage))
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_a = sum(seen_rows)
    assert n_a == half_a.count()

    for f in b_dir.glob("*.parquet"):
        shutil.copy(f, stage / f"b_{f.name}")
    run_once()
    n_total = sum(seen_rows)
    # second run saw ONLY the new file's rows
    assert n_total - n_a == half_b.count()
    want = {
        r.user_id: r["count"] for r in events.groupBy("user_id").count().collect()
    }
    assert totals == want
