"""Semantic checks for the rows-only / bounded-contract queries:
each one's claim is asserted here on top of its oracle.  session_window_agg
is covered in test_session_windows.py and ann_cosine_lsh in
test_similarity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.relational import approx_distinct_users
from cocktails_data_engineering_spark.sources.io import jdbc_roundtrip
from cocktails_data_engineering_spark.sources.tables import load


def test_approx_distinct_within_5pct_of_exact(spark, sf_dir):
    got = {
        r.event_type: (r.exact_users, r.within_bound)
        for r in approx_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, ex in exact.items():
        assert got[et][0] == ex, (et, got[et], ex)
        assert got[et][1], (et, got[et], ex)


def test_jdbc_roundtrip_reports_ok(spark, sf_dir):
    from cocktails_data_engineering_spark.sources.io import LAST_JDBC_RUN

    row = jdbc_roundtrip(spark, sf_dir).collect()[0]
    assert row.roundtrip_ok
    assert row.n_rows > 0
    assert LAST_JDBC_RUN["n_written"] == LAST_JDBC_RUN["n_read"] == row.n_rows
    assert LAST_JDBC_RUN["sink"] in (
        "jdbc", "jdbc_derby_embedded", "parquet_fallback"
    )


def test_rows_only_set_is_pinned(spark):
    """Tripwire: every query that CAN be oracled IS.  The approximate
    sketches were promoted to bounded-contract oracles in r9 and the JDBC
    roundtrip to a read-back value contract in r11, so the rows-only set
    is EMPTY — any accidental oracle removal or un-oracled new query
    fails here."""
    from cocktails_data_engineering_spark.plans.queries import all_oracles, all_queries

    rows_only = set(all_queries()) - set(all_oracles())
    assert rows_only == set()
