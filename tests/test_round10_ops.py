"""Semantic-invariant tests for the round-10 operators.

The DuckDB differential certifies Spark↔oracle parity; these tests pin the
ALGORITHMS' meaning on fixtures built to exercise the interesting regimes
(a planted hot key, a hand-computable waterfill, a duplicated corpus, a
backlog with genuinely late rows).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, path: str, rows: list[tuple]) -> str:
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


# ---------------------------------------------------------------------------
# lsh_band_plan_curve
# ---------------------------------------------------------------------------
def test_lsh_band_plan_more_bands_never_cheaper_and_scurve_monotone(spark, tmp_path):
    """On a corpus with planted duplicate groups: (a) the analytic catch
    probability rises with band count at fixed 128 hashes, (b) the
    measured pair workload is non-decreasing in band count (every bucket
    collision under coarse banding implies one under finer banding of the
    same signature... the converse direction: more bands = more chances
    to collide), and (c) capped workload never exceeds raw workload."""
    from cocktails_data_engineering_spark.operators.dedup import lsh_band_plan_curve

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for g in range(10):
        text = base + f" group{g} tail words for distinctness {g}"
        for c in range(4):  # 4 exact copies per group -> identical signatures
            rows.append((g * 10 + c, text, "en", "web", len(text)))
    sf = _write_docs(spark, str(tmp_path), rows)
    out = sorted(
        lsh_band_plan_curve(spark, sf).collect(), key=lambda r: -r["n_bands"]
    )
    assert [r["cfg"] for r in out] == ["b64r2", "b32r4", "b16r8", "b8r16"]
    p50 = [r["p_catch_50"] for r in out]
    p80 = [r["p_catch_80"] for r in out]
    assert p50 == sorted(p50, reverse=True)
    assert p80 == sorted(p80, reverse=True)
    wl = [r["pair_workload"] for r in out]
    assert wl == sorted(wl, reverse=True)
    for r in out:
        assert r["capped_workload"] <= r["pair_workload"]
        # identical docs collide in EVERY band: 10 groups x C(4,2)=6 pairs
        # per band is the floor for the workload.
        assert r["pair_workload"] >= r["n_bands"] * 10 * 6


# ---------------------------------------------------------------------------
# unimax_epoch_weights
# ---------------------------------------------------------------------------
def test_unimax_waterfill_hand_computed(spark, tmp_path):
    """3 domains with 10/20/100 tokens, cap 3 epochs, budget 2x total=260:
    caps are 30/60/300.  Waterfill: domain A capped (30*3+0=90<=260),
    domain B capped (60*2+30=150<=260), domain C uncapped (300+90>260)
    -> uniform share = 260-90 = 170.  Epochs: 3 / 3 / 1.7."""
    from cocktails_data_engineering_spark.operators.curation import (
        unimax_epoch_weights,
    )

    def words(n: int, tag: str) -> str:
        return " ".join(f"{tag}{i}" for i in range(n))

    sf = _write_docs(
        spark,
        str(tmp_path),
        [
            (1, words(10, "a"), "en", "src_a", 10),
            (2, words(20, "b"), "en", "src_b", 20),
            (3, words(100, "c"), "en", "src_c", 100),
        ],
    )
    out = {r["source"]: r for r in unimax_epoch_weights(spark, sf).collect()}
    assert out["src_a"]["is_capped"] == 1 and out["src_a"]["alloc_tokens"] == 30.0
    assert out["src_b"]["is_capped"] == 1 and out["src_b"]["alloc_tokens"] == 60.0
    assert out["src_c"]["is_capped"] == 0 and out["src_c"]["alloc_tokens"] == 170.0
    assert out["src_a"]["epochs"] == 3.0
    assert out["src_c"]["epochs"] == pytest.approx(1.7)
    assert sum(r["weight"] for r in out.values()) == pytest.approx(1.0, abs=2e-6)


def test_unimax_all_capped_when_budget_exceeds_every_cap(spark, tmp_path):
    """If the budget can grant every domain its full epoch cap, everyone is
    capped and total allocation stays below budget (leftover unspent)."""
    from cocktails_data_engineering_spark.operators import curation

    # budget = 2x total; make one domain so large it pushes budget above
    # all caps is impossible with cap 3 > budget 2 per token... instead
    # check the degenerate one-domain case: cap 3n > budget 2n -> uncapped,
    # gets the whole budget = 2 epochs.
    sf = _write_docs(
        spark,
        str(tmp_path),
        [(1, " ".join(f"w{i}" for i in range(50)), "en", "only", 50)],
    )
    out = curation.unimax_epoch_weights(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["is_capped"] == 0
    assert out[0]["epochs"] == pytest.approx(2.0)
    assert out[0]["weight"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# skew_key_diagnosis
# ---------------------------------------------------------------------------
def test_skew_key_diagnosis_planted_hot_key(spark, tmp_path):
    """One user with 900 of 1000 rows: it must lead the top-k with
    share 0.9 and a salting recommendation ~ n_keys * 0.9."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for _ in range(900):
        rows.append((eid, base, 7, "view", 1.0, None))
        eid += 1
    for u in range(100):  # 100 cold keys, one row each
        rows.append((eid, base, 100 + u, "view", 1.0, None))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = all_queries()["skew_key_diagnosis"](spark, str(tmp_path)).collect()
    assert out[0]["user_id"] == 7
    assert out[0]["n_rows"] == 900
    assert out[0]["share"] == 0.9
    # 101 keys, mean ~9.9 rows -> hot key needs ceil(900*101/1000)=91 salts
    assert out[0]["rec_salts"] == 91
    # cold keys: 1 row, skew_ratio 0.101 -> rec_salts ceil(101/1000)=1
    assert all(r["rec_salts"] == 1 for r in out[1:])


# ---------------------------------------------------------------------------
# stream_watermark_drop_audit
# ---------------------------------------------------------------------------
def test_watermark_audit_internal_consistency(spark):
    """At sf0.001: late rows exist and are dropped, a trailing-hour band is
    pending, and the accounting identities hold exactly."""
    from cocktails_data_engineering_spark.streaming.events import (
        stream_watermark_drop_audit,
    )

    import duckdb

    r = stream_watermark_drop_audit(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_input"] == r["n_admitted"] + r["n_late_dropped"]
    assert r["n_admitted"] == r["n_rows_emitted"] + r["n_pending"]
    assert r["n_late_dropped"] > 0  # the 30-day backlog has a >14d tail
    assert r["n_windows_emitted"] > 0
    # n_rows_emitted pinned against an INDEPENDENT batch computation of the
    # watermark model (the operator derives the other columns from it, so
    # only an external value makes the identities non-tautological).
    expected = duckdb.sql("""
        WITH b AS (SELECT MAX(ts) AS mx
                   FROM read_parquet('/root/testdata/sf0.001/events.parquet'))
        SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.001/events.parquet'), b
        WHERE ts >= mx - INTERVAL 14 DAY
          AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 1 HOUR
    """).fetchone()[0]
    assert r["n_rows_emitted"] == expected


# ---------------------------------------------------------------------------
# hll_intersection_estimate
# ---------------------------------------------------------------------------
def test_hll_intersection_planted_overlap(spark, tmp_path):
    """Two event types with users 0..99 and 50..149: exact sizes 100/100,
    union 150, intersection 50 — and the sketch-differenced estimate at
    this cardinality must sit within the compounded bound."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(100):
        rows.append((eid, base, u, "view", 1.0, None)); eid += 1
    for u in range(50, 150):
        rows.append((eid, base, u, "purchase", 1.0, None)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = all_queries()["hll_intersection_estimate"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("purchase", "view")
    assert (r["exact_a"], r["exact_b"]) == (100, 100)
    assert r["exact_union"] == 150 and r["exact_inter"] == 50
    assert r["within_bound"] is True


# ---------------------------------------------------------------------------
# adaptive_banding_dedup
# ---------------------------------------------------------------------------
def test_adaptive_banding_finds_planted_dups_with_eligible_config(spark, tmp_path):
    """On the 10-group x 4-copy corpus: the chosen config must clear the
    analytic recall floor at Jaccard 0.8, and the candidate pairs must
    connect every planted duplicate group (identical docs share ALL
    bands under any banding)."""
    from cocktails_data_engineering_spark.operators.dedup import (
        ADAPT_RECALL_FLOOR,
        _catch_prob,
        adaptive_banding_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for g in range(10):
        text = base + f" group{g} tail words for distinctness {g}"
        for c in range(4):
            rows.append((g * 10 + c, text, "en", "web", len(text)))
    sf = _write_docs(spark, str(tmp_path), rows)
    out = adaptive_banding_dedup(spark, sf).collect()
    cfgs = {r["cfg"] for r in out}
    assert len(cfgs) == 1
    cfg = cfgs.pop()
    b, r = (int(x) for x in cfg[1:].split("r"))
    assert _catch_prob(0.8, b, r) >= ADAPT_RECALL_FLOOR
    # connectivity per planted group: each group's 4 copies form one
    # component within the candidate graph
    import collections

    adj = collections.defaultdict(set)
    for row in out:
        adj[row["doc_a"]].add(row["doc_b"])
        adj[row["doc_b"]].add(row["doc_a"])
    for g in range(10):
        members = {g * 10 + c for c in range(4)}
        seen, todo = set(), [g * 10]
        while todo:
            n = todo.pop()
            if n in seen:
                continue
            seen.add(n)
            todo.extend(adj[n] & members)
        assert seen == members, f"group {g} not fully connected: {seen}"


# ---------------------------------------------------------------------------
# encoding_plan_audit
# ---------------------------------------------------------------------------
def test_encoding_plan_recommends_by_regime(spark):
    """At sf0.001: the 3-value flag columns must come back dictionary-coded
    (tiny alphabet), the high-cardinality suppkey must not be RLE (runs
    of 1 under natural order), and every row's stats must satisfy the
    rule the recommendation claims."""
    from cocktails_data_engineering_spark.operators.warehouse import (
        ENC_DICT_NDV_CAP,
        ENC_DICT_RATIO_CAP,
        ENC_RLE_RUN_MIN,
        encoding_plan_audit,
    )

    out = {r["column_name"]: r for r in
           encoding_plan_audit(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {"l_returnflag", "l_linestatus", "l_quantity",
                        "l_discount", "l_shipdate", "l_suppkey"}
    for r in out.values():
        dict_ok = (r["ndv"] <= ENC_DICT_NDV_CAP
                   and r["ndv_ratio"] <= ENC_DICT_RATIO_CAP)
        if not dict_ok:
            assert r["encoding"] == "PLAIN"
        elif r["avg_run_len"] >= ENC_RLE_RUN_MIN:
            assert r["encoding"] == "RLE_DICTIONARY"
        else:
            assert r["encoding"] == "DICTIONARY"
    assert out["l_linestatus"]["ndv"] <= 3
    assert out["l_returnflag"]["ndv"] <= 3
    assert out["l_linestatus"]["encoding"] in ("DICTIONARY", "RLE_DICTIONARY")


# ---------------------------------------------------------------------------
# maxsim_late_interaction
# ---------------------------------------------------------------------------
def test_maxsim_rerank_contract(spark):
    """At sf0.001: exactly TOP_K rows per query, every reranked doc comes
    from the coarse pool (rank keys are dense 1..K), and MaxSim >= the
    full-vector cosine is NOT required — but an identical-direction pair
    must score maxsim == 1 on itself-free pools, so instead check the
    algebraic ceiling |maxsim| <= 1 + 1e-9 and per-query rank density."""
    from cocktails_data_engineering_spark.operators.similarity import (
        TOP_K,
        maxsim_late_interaction,
    )

    out = maxsim_late_interaction(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
        assert abs(r["maxsim_score"]) <= 1 + 1e-9
        assert abs(r["coarse_score"]) <= 1 + 1e-9
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, TOP_K + 1))
        scores = [r["maxsim_score"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# near_dup_transitivity_audit
# ---------------------------------------------------------------------------
def test_transitivity_audit_identities(spark):
    """At sf0.01 over the cached candidates: per size-band, edges never
    exceed implied pairs, density in (0, 1], size-2 clusters are never
    chained (1 edge == 1 implied pair)."""
    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = all_queries()["near_dup_transitivity_audit"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert out, "no near-dup clusters in fixture?"
    for r in out:
        assert 0 < r["total_edges"] <= r["total_implied_pairs"]
        assert 0 < r["edge_density"] <= 1.0
        if r["cluster_size"] == 2:
            assert r["n_chained_clusters"] == 0


# ---------------------------------------------------------------------------
# shard_shuffle_epoch_plan
# ---------------------------------------------------------------------------
def test_shard_shuffle_epochs_decorrelated(spark):
    """At sf0.001: 3 epoch pairs over 64 shards, each rho in [-1, 1] and
    well below perfect correlation (the hash orders are independent)."""
    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = all_queries()["shard_shuffle_epoch_plan"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_shards"] == 64
        assert -1.0 <= r["spearman_rho"] <= 1.0
        assert abs(r["spearman_rho"]) < 0.5  # independent seeded orders


# ---------------------------------------------------------------------------
# dp_contribution_bounding
# ---------------------------------------------------------------------------
def test_dp_bounding_caps_heavy_user(spark, tmp_path):
    """A user with 100 events against 10 one-event users: after the cap of
    5, the heavy user contributes exactly 5 rows and the max share falls
    from 100/110 to 5/15."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for i in range(100):  # heavy user 1, increasing ts
        rows.append((eid, base + dt.timedelta(minutes=i), 1, "view", 1.0, None))
        eid += 1
    for u in range(2, 12):
        rows.append((eid, base, u, "view", 1.0, None))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = all_queries()["dp_contribution_bounding"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows_before"] == 110 and r["n_rows_after"] == 15
    assert r["max_user_rows_before"] == 100 and r["max_user_rows_after"] == 5
    assert r["max_user_share_before"] == round(100 / 110, 6)
    assert r["max_user_share_after"] == round(5 / 15, 6)


# ---------------------------------------------------------------------------
# personalized_pagerank_seeds
# ---------------------------------------------------------------------------
def test_ppr_mass_concentrates_on_and_near_seeds(spark):
    """At sf0.001: total PPR mass stays <= 1 (dangling loss only), every
    rank is non-negative, and the seed set's total mass exceeds a
    uniform share (teleport restarts there every round)."""
    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = all_queries()["personalized_pagerank_seeds"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(r["rank"] >= 0 for r in out)
    total = sum(r["rank"] for r in out)
    assert total <= 1.0 + 1e-6
    seed_mass = sum(r["rank"] for r in out if r["is_seed"])
    n_seed = sum(1 for r in out if r["is_seed"])
    assert 0 < n_seed < len(out)
    assert seed_mass > total * n_seed / len(out)  # concentrated vs uniform


# ---------------------------------------------------------------------------
# functional_dependency_audit / late_arriving_dim_merge
# ---------------------------------------------------------------------------
def test_fd_audit_key_fds_hold(spark):
    """At sf0.001: key-determined pairs (orderkey->custkey,
    custkey->nationkey) must hold; coarse pairs must not."""
    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = {(r["determinant"], r["dependent"]): r
           for r in all_queries()["functional_dependency_audit"](
               spark, "/root/testdata/sf0.001").collect()}
    assert out[("o_orderkey", "o_custkey")]["holds"] == 1
    assert out[("c_custkey", "c_nationkey")]["holds"] == 1
    assert out[("o_custkey", "o_orderpriority")]["holds"] == 0
    for r in out.values():
        assert r["n_violating_groups"] == r["n_lhs_rhs"] - r["n_lhs"]


def test_late_arriving_dim_accounting(spark):
    """At sf0.001: inferred + matched covers all facts, backfill resolves
    everything except the never-arriving tail, and unresolved members
    are exactly the %33 orphan keys that appear in facts."""
    from cocktails_data_engineering_spark.operators.warehouse import (
        LATE_DIM_MOD,
        NEVER_DIM_MOD,
        late_arriving_dim_merge,
    )
    import duckdb

    r = late_arriving_dim_merge(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_matched_initial"] + r["n_inferred_facts"] == r["n_facts"]
    assert r["n_backfilled_members"] + r["n_unresolved_members"] == r["n_inferred_members"]
    expected_unresolved = duckdb.sql(f"""
        SELECT COUNT(DISTINCT o_custkey)
        FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
        WHERE o_custkey % {NEVER_DIM_MOD} = 0
          AND o_custkey IN (
            SELECT c_custkey FROM read_parquet('/root/testdata/sf0.001/customer.parquet')
            WHERE c_custkey % {LATE_DIM_MOD} = 0)
    """).fetchone()[0]
    assert r["n_unresolved_members"] >= expected_unresolved


# ---------------------------------------------------------------------------
# neyman_allocation_plan
# ---------------------------------------------------------------------------
def test_neyman_allocation_favors_variable_strata(spark):
    """At sf0.001: fractions sum to ~1, floored counts sum to <= budget,
    and allocation ranks follow N_h * sigma_h mass (the optimality
    property Neyman allocation exists for)."""
    from cocktails_data_engineering_spark.plans.queries import all_queries
    from cocktails_data_engineering_spark.operators.profiling import NEYMAN_BUDGET

    out = all_queries()["neyman_allocation_plan"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 5
    assert sum(r["alloc_frac"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["alloc_n"] for r in out) <= NEYMAN_BUDGET
    mass = {r["stratum"]: r["n_rows"] * r["sigma"] for r in out}
    fracs = {r["stratum"]: r["alloc_frac"] for r in out}
    assert sorted(mass, key=mass.get) == sorted(fracs, key=fracs.get)


# ---------------------------------------------------------------------------
# table_health_report
# ---------------------------------------------------------------------------
def test_health_report_composes_all_four_checks(spark):
    """At sf0.001: all four check families present; every component row
    appears; the flag rule matches the component columns."""
    from cocktails_data_engineering_spark.plans.queries import all_queries

    qs = all_queries()
    out = qs["table_health_report"](spark, "/root/testdata/sf0.001").collect()
    checks = {r["check_name"] for r in out}
    assert checks == {"encoding", "functional_dependency", "join_key_skew",
                      "dq_expectation"}
    n_enc = qs["encoding_plan_audit"](spark, "/root/testdata/sf0.001").count()
    n_fd = qs["functional_dependency_audit"](spark, "/root/testdata/sf0.001").count()
    assert sum(1 for r in out if r["check_name"] == "encoding") == n_enc
    assert sum(1 for r in out if r["check_name"] == "functional_dependency") == n_fd
    fd_rows = [r for r in out if r["check_name"] == "functional_dependency"]
    assert any(r["flagged"] == 1 for r in fd_rows)  # coarse FDs break
    assert any(r["flagged"] == 0 for r in fd_rows)  # key FDs hold


# ---------------------------------------------------------------------------
# pca_power_iteration_top
# ---------------------------------------------------------------------------
def test_pca_top_component_contract(spark):
    """At sf0.001: 64 unit-norm loadings, canonical sign (largest-|l|
    coordinate positive), and the found direction's Rayleigh quotient
    beats the mean coordinate axis by construction (it is a dominant
    direction after 3 matvec rounds)."""
    import numpy as np

    from cocktails_data_engineering_spark.plans.queries import all_queries

    out = all_queries()["pca_power_iteration_top"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    v = np.zeros(64)
    for r in out:
        v[r["dim"]] = r["loading"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    assert v[int(np.argmax(np.abs(v)))] > 0  # canonical sign
    emb = np.array(
        [r["embedding"] for r in spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet").collect()],
        dtype=np.float64,
    )
    xc = emb - emb.mean(axis=0)
    cov = xc.T @ xc / len(xc)
    rq = float(v @ cov @ v)
    axis_rqs = np.diag(cov)
    assert rq >= float(axis_rqs.mean())  # beats the average axis
    # Power iteration's defining property: each matvec round cannot
    # decrease the Rayleigh quotient, so 3 rounds must beat the start
    # vector.  (The synthetic cloud's spectrum is nearly flat, so exact
    # eigenvector proximity is NOT a fair 3-round expectation — the
    # DuckDB oracle already pins the computation itself bit-for-bit.)
    v0 = np.ones(64) / 8.0
    assert rq > float(v0 @ cov @ v0)


def test_adaptive_banding_empty_corpus_returns_empty(spark, tmp_path):
    """Zero documents: the census is zero rows; the adaptive choice must
    default workloads to 0 and return an EMPTY candidate set (review
    r10: it raised KeyError instead)."""
    from cocktails_data_engineering_spark.operators.dedup import (
        adaptive_banding_dedup,
    )

    sf = _write_docs(spark, str(tmp_path), [])
    assert adaptive_banding_dedup(spark, sf).count() == 0


def test_int_div_exact_above_2_53(spark):
    """Quotients must stay exact for dividends beyond 2^53 (review r10:
    the double-division route flipped ~3% of them; the DECIMAL route
    cannot)."""
    import pyspark.sql.functions as F

    from cocktails_data_engineering_spark.functions.numerics import int_div

    rows = [(7860390340973931 * 1024 + k, 1000 + k) for k in range(50)]
    df = spark.createDataFrame(rows, "m long, d long")
    out = df.select("m", "d", int_div(F.col("m"), F.col("d")).alias("q")).collect()
    for r in out:
        assert r["q"] == r["m"] // r["d"], (r["m"], r["d"])
