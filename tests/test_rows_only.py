"""Semantic checks for the rows-only queries (no SQL oracle by design):
each one's claim is asserted here instead.  session_window_agg is covered
in test_session_windows.py and ann_cosine_lsh in test_similarity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.relational import approx_distinct_users
from cocktails_data_engineering_spark.sources.io import jdbc_roundtrip
from cocktails_data_engineering_spark.sources.tables import load


def test_approx_distinct_within_5pct_of_exact(spark, sf_dir):
    approx = {r.event_type: r.approx_users for r in approx_distinct_users(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.exact
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(1, 0.05 * ex), (et, approx[et], ex)


def test_jdbc_roundtrip_reports_ok(spark, sf_dir):
    row = jdbc_roundtrip(spark, sf_dir).collect()[0]
    assert row.roundtrip_ok
    assert row.n_written == row.n_read > 0
    assert row.sink in ("jdbc", "parquet_fallback")
