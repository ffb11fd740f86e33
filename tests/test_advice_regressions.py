"""Regression tests for edge-case semantics the generic DuckDB differential
can't reach with the dense, well-formed driver fixtures: a calendar gap in
the day spine, an empty audio payload, and a zero-variance anomaly baseline.

Each test plants a tiny synthetic table tree and runs the REGISTERED
operator against it, so the contract is checked on the same code path the
driver exercises.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from cocktails_data_engineering_spark.operators import multimodal, sketches, timeseries


def _write_events(spark, path: str, rows: list[tuple]) -> str:
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))
    return path


def test_hll_rolling_7d_skips_gap_days_not_calendar_days(spark, tmp_path):
    """Days 1..3 then a jump to day 10: the trailing-7-calendar-day window at
    day 10 must contain ONLY day 10 (days 1-3 are 7+ days old).  A ROWS
    frame over observed days would stretch back and union all four
    sketches."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for day, users in [(0, [1, 2]), (1, [3, 4]), (2, [5, 6]), (9, [7])]:
        for u in users:
            rows.append((eid, base + dt.timedelta(days=day), u, "view", 1.0, None))
            eid += 1
    sf = _write_events(spark, str(tmp_path), rows)
    out = {
        r["day"]: (r["exact_users_7d"], r["within_bound"])
        for r in sketches.hll_rolling_7d_users(spark, sf).collect()
    }
    # within_bound proves the HLL side saw the same eviction (exact here).
    assert out["2024-01-10"] == (1, True)  # NOT 7: the gap must evict days 1-3
    assert out["2024-01-03"] == (6, True)  # days 1-3 all inside the window


def test_audio_chunk_segments_empty_payload_emits_no_rows(spark, tmp_path):
    """n_bytes = 0 ⇒ n_segs = 0 ⇒ zero segment rows.  Unguarded,
    sequence(0, -1) infers step -1 and emits [0, -1] — two phantom
    segments for an empty recording."""
    docs = spark.createDataFrame(
        # doc_id % 4 == 1 → audio modality; one empty, one 2500-byte doc.
        [(1, "", "en", "web", 0), (5, "x" * 2500, "en", "web", 2500)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    rows = multimodal.audio_chunk_segments(spark, str(tmp_path)).collect()
    # 2500 bytes → 2.5 s → ceil(2.5 / 0.5) = 5 segments; NONE for the empty doc.
    assert sorted((r["doc_id"], r["seg_idx"]) for r in rows) == [(5, i) for i in range(5)]


def test_anomaly_zscore_flags_spike_after_flat_baseline(spark, tmp_path):
    """24 hours of exactly 2 events/hour (zero variance), then a 50-event
    hour: z is undefined (NULL) but the spike MUST be flagged — the
    disc = 0 case a monitor most wants to catch."""
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h in range(24):
        for k in range(2):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=k), 1, "view", 1.0, None))
            eid += 1
    for k in range(50):
        rows.append((eid, base + dt.timedelta(hours=24, minutes=k % 60), 1, "view", 1.0, None))
        eid += 1
    sf = _write_events(spark, str(tmp_path), rows)
    out = {r["hour"]: r for r in timeseries.anomaly_zscore_hourly(spark, sf).collect()}
    spike = out["2024-03-02 00:00:00"]
    assert spike["x"] == 50
    assert spike["zscore"] is None  # no finite z exists over a flat baseline
    assert spike["is_anomaly"] == 1
    # ...and a flat continuation is NOT flagged.
    flat = out["2024-03-01 23:00:00"]
    assert flat["is_anomaly"] == 0


def _write_docs(spark, path: str, rows: list[tuple]) -> str:
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    return path


def test_aligned_block_dedup_short_docs_do_not_pair_on_empty_blocks(spark, tmp_path):
    """Docs with fewer words than BLOCKS leave trailing quarters EMPTY;
    md5('') matches across documents, so without the non-empty guard any
    two 2-word docs share two (position, '') blocks and are reported as
    near-dups (advice r5).  Distinct short docs must NOT pair; genuinely
    identical docs still must."""
    from cocktails_data_engineering_spark.operators.dedup import aligned_block_dedup

    long_text = " ".join(f"w{i}" for i in range(8))
    sf = _write_docs(
        spark,
        str(tmp_path),
        [
            (1, "alpha beta", "en", "web", 10),
            (2, "gamma delta", "en", "web", 11),
            (3, long_text, "en", "web", len(long_text)),
            (4, long_text, "en", "web", len(long_text)),
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in aligned_block_dedup(spark, sf).collect()}
    assert pairs == {(3, 4)}  # no (1, 2) phantom pair from empty quarters


def test_compaction_bin_packing_floor_semantics_above_target(spark, tmp_path):
    """Fixture whose cumulative sizes EXCEED the bin target so fractional
    before/target >= 0.5 occurs (advice r5: masked at sf0.01): bin must be
    floor(before/target) on BOTH engines — round-to-nearest would put the
    before = 1.5*target file in bin 2 instead of bin 1."""
    import duckdb

    from cocktails_data_engineering_spark.operators.warehouse import _COMPACT_TARGET
    from cocktails_data_engineering_spark.plans.queries import all_oracles, all_queries
    from tests.test_oracle_parity import compare_query

    half = _COMPACT_TARGET // 2  # 10 files of target/2 → before hits k*0.5*target
    sf = _write_docs(
        spark,
        str(tmp_path),
        [(i, "x", "en", "web", half) for i in range(1, 11)],
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    try:
        compare_query(
            spark,
            con,
            sf,
            "compaction_bin_packing",
            all_queries()["compaction_bin_packing"],
            all_oracles()["compaction_bin_packing"],
        )
    finally:
        con.close()
    # Explicit floor check: before = 3*half = 1.5*target → bin 1, not 2.
    out = all_queries()["compaction_bin_packing"](spark, sf).collect()
    by_bin = {r["bin"]: r["n_files"] for r in out}
    # bins: before/target = 0, .5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5 →
    # floor → bins 0,0,1,1,2,2,3,3,4,4 (two files per bin).
    assert by_bin == {0: 2, 1: 2, 2: 2, 3: 2, 4: 2}


def test_table_fingerprint_sees_nested_partition_files(tmp_path):
    """An in-place overwrite of a file inside a partition SUBDIR changes
    neither the subdir entry's size nor (reliably) its mtime, so a shallow
    listdir fingerprint would serve stale cached results (advice r9).  The
    recursive walk must change when any nested file changes."""
    from cocktails_data_engineering_spark.sources.tables import table_fingerprint

    root = tmp_path / "documents.parquet" / "lang=en"
    root.mkdir(parents=True)
    inner = root / "part-00000.parquet"
    inner.write_bytes(b"A" * 64)
    before = table_fingerprint(str(tmp_path), "documents")
    assert "part-00000.parquet" in before  # nested files ARE in the key
    # In-place same-size rewrite: only the nested file's mtime_ns moves.
    inner.write_bytes(b"B" * 64)
    after = table_fingerprint(str(tmp_path), "documents")
    assert before != after


def test_minhash_candidates_cache_builds_once_under_concurrency(spark, tmp_path, monkeypatch):
    """dedup_detector_agreement submits the four detector builds from
    concurrent driver threads; the _CANDS_CACHE double-checked lock must
    collapse simultaneous first-touch consumers to ONE candidate build
    (advice r9: unsynchronized check-then-set ran it twice)."""
    from concurrent.futures import ThreadPoolExecutor

    from cocktails_data_engineering_spark.operators import dedup

    sf = _write_docs(
        spark,
        str(tmp_path),
        [(i, f"alpha beta gamma delta w{i} x y z q r", "en", "web", 30) for i in range(6)],
    )
    calls = []
    real_build = dedup.build_minhash_candidates

    def counting_build(sp, sd):
        calls.append(sd)
        return real_build(sp, sd)

    monkeypatch.setattr(dedup, "build_minhash_candidates", counting_build)
    with ThreadPoolExecutor(4) as ex:
        frames = list(ex.map(lambda _: dedup.minhash_candidates(spark, sf), range(4)))
    assert len(calls) == 1
    counts = {f.count() for f in frames}
    assert len(counts) == 1  # all four callers share the one checkpoint


def test_int_div_matches_integer_floor_for_awkward_divisors(spark):
    """Shard/pack ids must be integer floor division for ANY cap, not just
    powers of two (advice r9: double-division parity held only because
    SHARD_CAP_BYTES had a cooperative bit pattern).  Check exact-boundary
    offsets against Python // for divisors 1000 and 3."""
    import pyspark.sql.functions as F

    from cocktails_data_engineering_spark.functions.numerics import int_div

    vals = [0, 1, 999, 1000, 1001, 2999, 3000, 3 * 10**12, 3 * 10**12 + 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = df.select(
        "v",
        int_div(F.col("v"), 1000).alias("d1000"),
        int_div(F.col("v"), 3).alias("d3"),
    ).collect()
    for r in out:
        assert r["d1000"] == r["v"] // 1000, r
        assert r["d3"] == r["v"] // 3, r


def test_stream_python_datasource_agg_reruns_in_same_session(spark):
    """The memory-sink name must not collide across calls in one session
    (advice r9: id(spark)-derived name persisted after q.stop()).  Two
    back-to-back runs must BOTH drain the feed and agree."""
    from cocktails_data_engineering_spark.sources.python_source import (
        STREAM_ROWS,
        stream_python_datasource_agg,
    )

    first = {r["kind"]: (r["n_rows"], r["sum_val"], r["max_id"])
             for r in stream_python_datasource_agg(spark, "unused").collect()}
    second = {r["kind"]: (r["n_rows"], r["sum_val"], r["max_id"])
              for r in stream_python_datasource_agg(spark, "unused").collect()}
    assert first == second
    assert sum(v[0] for v in first.values()) == STREAM_ROWS


def test_pca_degenerate_clouds_match_oracle(spark, tmp_path):
    """ADVICE r11: an all-identical (or single-vector) embedding cloud
    centers to all-zeros, so the power-iteration norm is 0 — the oracle's
    ROUND(w / 0, 9) is NULL per element and the Spark side must emit the
    same 64 NULL loadings instead of raising ZeroDivisionError; an empty
    table must yield zero rows.  Checked against the REAL oracle SQL in
    DuckDB on the same parquet."""
    import duckdb

    from cocktails_data_engineering_spark.operators import clustering

    for label, rows in {
        "identical": [(i, [0.5] * 64) for i in range(5)],
        "single": [(7, [float(j) for j in range(64)])],
        "empty": [],
    }.items():
        sf = os.path.join(str(tmp_path), label)
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sf, "embeddings.parquet")
        )
        got = sorted(
            (r["dim"], r["loading"])
            for r in clustering.pca_power_iteration_top(spark, sf).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
        )
        want = sorted(con.execute(clustering._pca_oracle()).fetchall())
        con.close()
        assert got == want, (label, got[:3], want[:3])


def test_pca_driver_rounding_is_half_up(spark):
    """ADVICE r10: driver-side scalars must round like F.round/DuckDB
    ROUND (half-away-from-zero on the shortest-decimal repr), not like
    Python's builtin (half-to-even)."""
    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.functions.numerics import round_half_up

    cases = [(0.5, 0), (1.5, 0), (2.5, 0), (-0.5, 0), (0.125, 2), (-0.125, 2),
             (1.0000000005, 9), (7.5e-10, 9), (0.3333333335, 9)]
    got = [round_half_up(x, n) for x, n in cases]
    want = list(
        spark.range(1)
        .select(*[F.round(F.lit(x), n).alias(f"c{i}") for i, (x, n) in enumerate(cases)])
        .collect()[0]
    )
    assert got == want, list(zip(cases, got, want))
    # and the builtin disagrees on at least one midpoint (the bug class)
    assert any(round(x, n) != g for (x, n), g in zip(cases, got))
