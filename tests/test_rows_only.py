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
    assert row.sink in ("jdbc", "jdbc_derby_embedded", "parquet_fallback")


def test_rows_only_set_is_pinned(spark):
    """Tripwire: every query that CAN be oracled IS.  The rows-only set
    must be exactly the approximate sketches (engine-specific algorithms
    DuckDB cannot reproduce) plus the side-effectful JDBC smoke — any
    accidental oracle removal or un-oracled new query fails here."""
    from cocktails_data_engineering_spark.plans.queries import all_oracles, all_queries

    rows_only = set(all_queries()) - set(all_oracles())
    assert rows_only == {
        "approx_distinct_users",
        "approx_topk_words",
        "hll_distinct_by_type",
        "hll_rolling_7d_users",
        "jdbc_roundtrip",
    }
