"""session_window_agg semantics beyond the DuckDB oracle: an independent
lag-gap sessionization at the same 5-minute gap (>= — per-event windows
[ts, ts+gap) merge only when they overlap) must agree on total session
count and per-user event totals."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.relational import session_window_agg
from cocktails_data_engineering_spark.sources.tables import load


def test_session_window_matches_lag_gap_sessionization(spark, sf_dir):
    native = session_window_agg(spark, sf_dir)

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        F.when(F.lag("ts").over(w).isNull() | (gap_us >= 300 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )

    n_native_sessions = native.count()
    n_lag_sessions = flagged.agg(F.sum("new_session")).collect()[0][0]
    assert n_native_sessions == n_lag_sessions

    native_per_user = {
        r.user_id: r.total
        for r in native.groupBy("user_id").agg(F.sum("n_events").alias("total")).collect()
    }
    events_per_user = {
        r.user_id: r.total
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("total")).collect()
    }
    assert native_per_user == events_per_user
