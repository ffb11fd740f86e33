"""Round-13 semantics tests: the artifact-cache rework (per-key build
locks, None-able builders, eager unpersist on clear — ADVICE r12), the
durable parquet index side-store (VERDICT r12 #2), and the daily-ingest
composition's screen → reverify → merge semantics on planted inputs
(VERDICT r12 #4)."""

from __future__ import annotations

import os
import threading

from cocktails_data_engineering_spark import caching
from cocktails_data_engineering_spark.operators import dedup


def test_builders_for_distinct_keys_run_concurrently(spark):
    """ADVICE r12: the old single module-wide lock serialized every
    builder behind any in-flight build.  Two builders that each need the
    OTHER to start before they can finish deadlock under a global build
    lock and pass under per-key locks."""
    caching.clear(spark)
    a_started, b_started = threading.Event(), threading.Event()

    def build_a():
        a_started.set()
        assert b_started.wait(timeout=30), "builder B never started: builds serialized"
        return "A"

    def build_b():
        b_started.set()
        assert a_started.wait(timeout=30), "builder A never started: builds serialized"
        return "B"

    results: dict[str, object] = {}
    t1 = threading.Thread(
        target=lambda: results.__setitem__("a", caching.get_or_build(spark, ("r13", "a"), build_a))
    )
    t2 = threading.Thread(
        target=lambda: results.__setitem__("b", caching.get_or_build(spark, ("r13", "b"), build_b))
    )
    t1.start(), t2.start()
    t1.join(timeout=60), t2.join(timeout=60)
    assert results == {"a": "A", "b": "B"}
    caching.clear(spark)


def test_same_key_builds_once_under_contention(spark):
    """Per-key locking must still guarantee exactly one build per key."""
    caching.clear(spark)
    calls = []
    gate = threading.Event()

    def build():
        calls.append(1)
        gate.wait(timeout=5)
        return "once"

    out: list[object] = []
    threads = [
        threading.Thread(
            target=lambda: out.append(caching.get_or_build(spark, ("r13", "same"), build))
        )
        for _ in range(4)
    ]
    for t in threads:
        t.start()
    gate.set()
    for t in threads:
        t.join(timeout=60)
    assert out == ["once"] * 4 and len(calls) == 1
    caching.clear(spark)


def test_none_valued_artifact_is_cached_not_rebuilt(spark):
    """ADVICE r12: a builder returning None must be memoized like any
    other value (the old None-as-miss sentinel silently rebuilt it on
    every call)."""
    caching.clear(spark)
    calls = []

    def build():
        calls.append(1)
        return None

    assert caching.get_or_build(spark, ("r13", "none"), build) is None
    assert caching.get_or_build(spark, ("r13", "none"), build) is None
    assert len(calls) == 1
    caching.clear(spark)


def test_clear_unpersists_cached_dataframes(spark):
    """ADVICE r12: clear() must eagerly free cached DataFrames' storage
    (including dict-valued artifacts) instead of waiting on ContextCleaner
    GC — observable via the storage level of a persist()-ed frame."""
    caching.clear(spark)
    df = spark.range(10).persist()
    df.count()
    nested = spark.range(5).persist()
    nested.count()
    caching.get_or_build(spark, ("r13", "df"), lambda: df)
    caching.get_or_build(spark, ("r13", "dict"), lambda: {"inner": nested})
    assert df.storageLevel.useMemory and nested.storageLevel.useMemory
    caching.clear(spark)
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
    assert not nested.storageLevel.useMemory and not nested.storageLevel.useDisk


def test_durable_store_serves_a_fresh_cache_without_rebuilding(spark, tmp_path):
    """VERDICT r12 #2: with spark.graft.indexDir set, the first build
    publishes parquet artifacts; after the in-memory cache is dropped
    (a fresh session), get_or_build_tables LOADS the store instead of
    calling the builder, and the loaded tables carry identical values."""
    store = str(tmp_path / "index_store")
    spark.conf.set(caching.STORE_DIR_CONF, store)
    try:
        caching.clear(spark)
        calls = []

        def build() -> dict:
            calls.append(1)
            return {
                "t1": spark.range(100).selectExpr("id", "id * 2 AS v"),
                "t2": spark.range(7).selectExpr("id AS k"),
            }

        key = ("r13", "store", "fixture-fp")
        first = caching.get_or_build_tables(spark, key, build)
        assert len(calls) == 1
        # published atomically with a verifiable marker
        entries = [d for d in os.listdir(store) if not d.startswith(".")]
        assert len(entries) == 1 and not entries[0].endswith("_COMPLETE")
        assert os.path.exists(os.path.join(store, entries[0], "_COMPLETE"))

        caching.clear(spark)  # simulate a fresh session's empty cache
        served = caching.get_or_build_tables(spark, key, build)
        assert len(calls) == 1, "store hit must not rebuild"
        for name in ("t1", "t2"):
            a = sorted(tuple(r) for r in first[name].collect())
            b = sorted(tuple(r) for r in served[name].collect())
            assert a == b
        # a DIFFERENT key (e.g. a rewritten fixture's fingerprint) must rebuild
        caching.clear(spark)
        caching.get_or_build_tables(spark, ("r13", "store", "other-fp"), build)
        assert len(calls) == 2
    finally:
        spark.conf.unset(caching.STORE_DIR_CONF)
        caching.clear(spark)


def test_pq_artifacts_durable_roundtrip_values_identical(spark, sf_dir, tmp_path):
    """The real consumer: IVF/PQ index artifacts served from the durable
    store must be bit-identical to a fresh build (same codes, same
    centroids), so every retrieval head's oracle hash is unchanged."""
    from cocktails_data_engineering_spark.operators import pq

    caching.clear(spark)
    fresh = {
        "enc": sorted(tuple(r) for r in pq.pq_index_artifacts(spark, sf_dir)["enc"].collect()),
        "cents1": sorted(
            (r["cid"], tuple(r["cemb"])) for r in pq.coarse_quantizer(spark, sf_dir)["cents1"].collect()
        ),
        "codes_r": sorted(tuple(r) for r in pq.residual_artifacts(spark, sf_dir)["codes_r"].collect()),
    }
    spark.conf.set(caching.STORE_DIR_CONF, str(tmp_path / "pq_store"))
    try:
        caching.clear(spark)
        pq.pq_index_artifacts(spark, sf_dir)  # builds + publishes
        pq.coarse_quantizer(spark, sf_dir)
        pq.residual_artifacts(spark, sf_dir)
        caching.clear(spark)  # fresh session: next calls LOAD the store
        served = {
            "enc": sorted(tuple(r) for r in pq.pq_index_artifacts(spark, sf_dir)["enc"].collect()),
            "cents1": sorted(
                (r["cid"], tuple(r["cemb"])) for r in pq.coarse_quantizer(spark, sf_dir)["cents1"].collect()
            ),
            "codes_r": sorted(
                tuple(r) for r in pq.residual_artifacts(spark, sf_dir)["codes_r"].collect()
            ),
        }
        assert served == fresh
    finally:
        spark.conf.unset(caching.STORE_DIR_CONF)
        caching.clear(spark)


def _shingled(spark, rows):
    return dedup._shingles(spark.createDataFrame(rows, "doc_id long, text string"))


def test_ingest_gate_refutes_planted_fluke_in_delta(spark):
    """The ingest composition on a planted batch (doc_id % 10 == 3):
    a FLUKE delta edge (batch doc 3 × corpus doc 11, zero shingle
    overlap, uncorroborated) must be refuted — neither endpoint enters
    the label store — while a genuine uncorroborated delta edge (2, 13)
    passes exact Jaccard and merges doc 13 into the base cluster."""
    shingled = _shingled(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),   # base pair with doc 1
            (11, "z y w v u t s r"),  # isolated corpus doc
            (3, "k l m n o p q j"),   # batch doc, NOTHING like doc 11
            (13, "a b c d e f g y"),  # batch doc, genuinely like doc 2
        ],
    )
    base = [(1, 2)]
    delta = [(2, 13), (3, 11)]
    all_pairs = spark.createDataFrame(base + delta, "doc_a long, doc_b long")
    delta_pairs = spark.createDataFrame(delta, "doc_a long, doc_b long")
    screened = dedup.screen_delta_edges(delta_pairs, all_pairs, shingled)
    assert sorted(tuple(r) for r in screened["weak"].collect()) == [(2, 13), (3, 11)]
    assert [tuple(r) for r in screened["refuted"].collect()] == [(3, 11)]
    assert [tuple(r) for r in screened["kept"].collect()] == [(2, 13)]

    base_labels = dedup.connected_components(
        spark.createDataFrame(base, "doc_a long, doc_b long")
    )
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.merge_delta_labels(screened["kept"], base_labels).collect()}
    # fluke endpoints never enter the label store
    assert 3 not in out and 11 not in out
    assert out == {1: (1, 1), 2: (1, 0), 13: (1, 0)}


def test_ingest_gate_trusts_corroborated_delta_edges(spark):
    """A delta triangle closing over a base pair: both delta edges
    (40,43) and (41,43) are corroborated (each has the other base doc as
    a common neighbor), so NEITHER is exact-Jaccard-verified — doc 43
    merges even with zero text overlap.  Corroboration substitutes for
    verification by design; the batch remediation loop would catch a
    triangle-welded wrong merge later (chain_edge_audit's density
    report), not the ingest gate."""
    shingled = _shingled(
        spark,
        [
            (40, "a b c d e f g h"),
            (41, "a b c d e f g x"),
            (43, "q r s t u v w z"),  # batch doc, dissimilar to both
        ],
    )
    base = [(40, 41)]
    delta = [(40, 43), (41, 43)]
    all_pairs = spark.createDataFrame(base + delta, "doc_a long, doc_b long")
    delta_pairs = spark.createDataFrame(delta, "doc_a long, doc_b long")
    screened = dedup.screen_delta_edges(delta_pairs, all_pairs, shingled)
    assert screened["weak"].count() == 0 and screened["refuted"].count() == 0
    base_labels = dedup.connected_components(
        spark.createDataFrame(base, "doc_a long, doc_b long")
    )
    out = {r.doc_id: r.cluster_id
           for r in dedup.merge_delta_labels(screened["kept"], base_labels).collect()}
    assert out == {40: 40, 41: 40, 43: 40}


def test_ingest_merge_matches_full_recompute_on_screened_graph(spark):
    """End-to-end differential on a mixed shape: screened-delta merge
    labels must equal from-scratch connected components over
    base ∪ kept edges (the oracle's definition), including a batch-only
    cluster and a refuted edge that isolates its batch doc."""
    shingled = _shingled(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),
            (11, "z y w v u t s r"),
            (3, "k l m n o p q j"),
            (13, "a b c d e f g y"),
            (23, "a b c d e f g w"),
        ],
    )
    base = [(1, 2)]
    # (13,23): batch-batch, genuine; (3,11): fluke; (2,13): genuine
    delta = [(2, 13), (3, 11), (13, 23)]
    all_pairs = spark.createDataFrame(base + delta, "doc_a long, doc_b long")
    delta_pairs = spark.createDataFrame(delta, "doc_a long, doc_b long")
    screened = dedup.screen_delta_edges(delta_pairs, all_pairs, shingled)
    base_labels = dedup.connected_components(
        spark.createDataFrame(base, "doc_a long, doc_b long")
    )
    merged = {r.doc_id: r.cluster_id
              for r in dedup.merge_delta_labels(screened["kept"], base_labels).collect()}
    kept_all = spark.createDataFrame(base, "doc_a long, doc_b long").unionByName(
        screened["kept"]
    )
    full = {r.node: r.cluster_id for r in dedup.connected_components(kept_all).collect()}
    assert merged == full
    assert merged[23] == 1  # transitively through 13 → 2 → 1


def test_dedup_state_store_serves_fresh_cache(spark, sf_dir, tmp_path):
    """The dedup state tables (candidates, cluster labels, base labels,
    weak edges) are durable-store-capable: a fresh cache (simulating a
    new process) with a populated spark.graft.indexDir loads parquet
    instead of re-running the LSH build, with identical values."""
    spark.conf.set(caching.STORE_DIR_CONF, str(tmp_path / "dedup_store"))
    try:
        caching.clear(spark)
        dedup._CANDS_CACHE.clear()
        first = {
            "cands": sorted(tuple(r) for r in dedup.minhash_candidates(spark, sf_dir).collect()),
            "labels": sorted(tuple(r) for r in dedup.cluster_labels(spark, sf_dir).collect()),
            "weak": sorted(tuple(r) for r in dedup.weak_pairs_cached(spark, sf_dir).collect()),
        }
        # fresh process: in-memory caches empty, store populated
        caching.clear(spark)
        dedup._CANDS_CACHE.clear()
        import cocktails_data_engineering_spark.operators.dedup as d

        orig = d.build_minhash_candidates
        calls = []
        d.build_minhash_candidates = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
        try:
            served = {
                "cands": sorted(tuple(r) for r in dedup.minhash_candidates(spark, sf_dir).collect()),
                "labels": sorted(tuple(r) for r in dedup.cluster_labels(spark, sf_dir).collect()),
                "weak": sorted(tuple(r) for r in dedup.weak_pairs_cached(spark, sf_dir).collect()),
            }
        finally:
            d.build_minhash_candidates = orig
        assert not calls, "populated store must not re-run the LSH build"
        assert served == first
    finally:
        spark.conf.unset(caching.STORE_DIR_CONF)
        caching.clear(spark)
        dedup._CANDS_CACHE.clear()


def test_stream_dedup_ingest_matches_batch_clusters(spark, sf_dir):
    """The streaming LSH ingest must (a) really run multiple
    micro-batches over the staged backlog and (b) land on the REGISTERED
    batch clustering exactly — same nodes, same component-min labels,
    same canonical flags."""
    from cocktails_data_engineering_spark.streaming import events as se

    streamed = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in se.stream_dedup_ingest_labels(spark, sf_dir).collect()
    }
    assert se.LAST_DEDUP_INGEST_BATCH_COUNT[0] >= 2
    batch = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup.dedup_clusters(spark, sf_dir).collect()
    }
    assert streamed == batch
