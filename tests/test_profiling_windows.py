"""Semantic invariants for the profiling / sliding-window / grouping-set
operators — properties the DuckDB differential check can't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators import profiling, relational
from cocktails_data_engineering_spark.sources.tables import load


def test_sliding_window_counts_each_event_twice(spark, sf_dir):
    """window/slide = 2 ⇒ total window membership is exactly 2× events."""
    n_events = load(spark, sf_dir, "events").count()
    total = (
        relational.sliding_window_agg(spark, sf_dir)
        .agg(F.sum("n_events").alias("s"))
        .collect()[0]["s"]
    )
    assert total == 2 * n_events


def test_tfidf_at_most_three_terms_per_doc_and_positive(spark, sf_dir):
    rows = profiling.tfidf_top_terms(spark, sf_dir).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert r["tf"] >= 1
        assert r["tfidf"] >= 0.0  # idf >= 0 since df <= n_docs
    assert per_doc and max(per_doc.values()) <= 3
    # every document with at least one token is represented
    n_docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "").count()
    assert len(per_doc) == n_docs


def test_grouping_sets_cardinality(spark, sf_dir):
    """Rows = |priorities| + |statuses| + 1 grand total, flags disjoint."""
    orders = load(spark, sf_dir, "orders")
    n_pri = orders.select("o_orderpriority").distinct().count()
    n_sta = orders.select("o_orderstatus").distinct().count()
    rows = relational.grouping_sets_priority_status(spark, sf_dir).collect()
    assert len(rows) == n_pri + n_sta + 1
    grand = [r for r in rows if r["g_priority"] == 1 and r["g_status"] == 1]
    assert len(grand) == 1 and grand[0]["n_orders"] == orders.count()


def test_stratified_sample_is_subset_and_deterministic(spark, sf_dir):
    ids1 = {r["doc_id"] for r in profiling.stratified_sample_docs(spark, sf_dir).collect()}
    ids2 = {r["doc_id"] for r in profiling.stratified_sample_docs(spark, sf_dir).collect()}
    assert ids1 == ids2  # content-independent hash ⇒ identical across runs
    all_ids = {r["doc_id"] for r in load(spark, sf_dir, "documents").select("doc_id").collect()}
    assert ids1 <= all_ids
    assert 0 < len(ids1) < len(all_ids)


def test_approx_percentile_within_tolerance_of_exact(spark, sf_dir):
    """Sketch quantiles must land within 2% rank error of exact ones
    (accuracy=10000 guarantees 1/10000; the loose bound keeps the test
    robust at tiny scale factors)."""
    orders = load(spark, sf_dir, "orders")
    approx = {
        r["o_orderpriority"]: r["approx_quantiles"]
        for r in profiling.approx_quantiles_by_priority(spark, sf_dir).collect()
    }
    for prio, quantiles in approx.items():
        prices = sorted(
            r["o_totalprice"]
            for r in orders.filter(F.col("o_orderpriority") == prio).collect()
        )
        n = len(prices)
        for q, got in zip([0.25, 0.5, 0.75, 0.95], quantiles):
            lo = prices[max(0, int((q - 0.02) * n) - 1)]
            hi = prices[min(n - 1, int((q + 0.02) * n))]
            assert lo <= got <= hi, (prio, q, got, lo, hi)


def test_profile_matches_direct_aggregates(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    prof = {r["column_name"]: r for r in profiling.profile_orders_columns(spark, sf_dir).collect()}
    assert prof["o_custkey"]["n_distinct"] == orders.select("o_custkey").distinct().count()
    assert prof["o_totalprice"]["max_num"] == orders.agg(F.max("o_totalprice")).collect()[0][0]
    assert all(r["n_rows"] == orders.count() for r in prof.values())


def test_json_parse_null_props_contract_cross_engine(spark, duck):
    """The NULL-props contract of json_parse_robustness, exercised with a
    planted NULL: both engines classify only non-null strings, so a frame
    containing NULL props must yield identical counts (Spark's
    from_json(NULL) would count it valid while DuckDB's json_valid(NULL)
    would count it corrupt — the isNotNull filter is what removes the
    divergence)."""
    rows = [('{"k": 1}',), ("{broken",), (None,), ("not json",), (None,), ('{"j": 2}',)]
    frame = spark.createDataFrame(rows, "props string")
    parsed = F.from_json(
        "props",
        "k INT, _corrupt_record STRING",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    corrupt = F.col("p._corrupt_record").isNotNull()
    got = (
        frame.filter(F.col("props").isNotNull())
        .select(parsed.alias("p"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(~corrupt, 1).otherwise(0)).alias("n_valid"),
            F.sum(F.when(corrupt, 1).otherwise(0)).alias("n_corrupt"),
        )
        .collect()[0]
    )
    values = ", ".join("(" + ("NULL" if p is None else f"'{p}'") + ")" for (p,) in rows)
    want = duck.execute(
        f"""
        SELECT COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt
        FROM (VALUES {values}) v(props) WHERE props IS NOT NULL
        """
    ).fetchone()
    assert (got["n_total"], got["n_valid"], got["n_corrupt"]) == want == (4, 2, 2)


def test_funnel_three_step_monotone(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.timeseries import funnel_three_step

    rows = {r.stage: r for r in funnel_three_step(spark, sf_dir).collect()}
    assert set(rows) == {"1_signup", "2_click", "3_purchase"}
    assert rows["1_signup"].n_users >= rows["2_click"].n_users >= rows["3_purchase"].n_users
    assert rows["1_signup"].share_of_entry == 1.0
