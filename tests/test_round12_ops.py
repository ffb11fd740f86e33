"""Round-12 operator semantics: the chain-edge remediation loop
(chain_edge_reverify) on a planted banding fluke, and the incremental
CC merge's session-cache interaction.  The oracle-parity suite already
proves both against DuckDB on the fixtures; these tests pin the
SEMANTICS on constructed inputs the fixtures can't guarantee (a real
fluke edge, a cluster that must split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_reverify_splits_planted_chain_fluke(spark):
    """Two genuine near-dup pairs (1,2) and (3,4) welded into one
    4-cluster by a planted fluke edge (2,3) with ZERO shingle overlap:
    the reverify loop must refute exactly the fluke (all three path
    edges are uncorroborated, but only the fluke fails exact Jaccard)
    and report the cluster splitting into two subclusters of size 2."""
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),  # 5/7 shingle Jaccard with doc 1
            (3, "p q r s t u v w"),
            (4, "p q r s t u v y"),  # 5/7 shingle Jaccard with doc 3
        ],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    out = dedup.reverify_chain_edges(pairs, dedup._shingles(docs)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.cluster_id, r.cluster_size) == (1, 4)
    assert r.n_weak_edges == 3  # every path edge lacks a common neighbor
    assert r.n_refuted_edges == 1  # only the fluke fails exact Jaccard
    assert (r.n_subclusters, r.largest_subcluster) == (2, 2)


def test_reverify_leaves_corroborated_triangle_alone(spark):
    """A triangle cluster (every edge shares a common neighbor) has no
    weak edges: nothing is re-verified — even if the texts were
    dissimilar — and the cluster stays whole.  A path cluster of three
    genuinely similar docs survives re-verification unsplit."""
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),
            (3, "a b c d e f g y"),
            # path cluster: 5-6 similar, 6-7 similar, 5-7 never flagged
            (5, "m n o p q r s t"),
            (6, "m n o p q r s u"),
            (7, "m n o p q r s v"),
        ],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (5, 6), (6, 7)], "doc_a long, doc_b long"
    )
    rows = {r.cluster_id: r for r in
            dedup.reverify_chain_edges(pairs, dedup._shingles(docs)).collect()}
    assert set(rows) == {1, 5}
    tri = rows[1]
    assert (tri.n_weak_edges, tri.n_refuted_edges) == (0, 0)
    assert (tri.n_subclusters, tri.largest_subcluster) == (1, 3)
    path = rows[5]
    assert path.n_weak_edges == 2  # both path edges uncorroborated
    assert path.n_refuted_edges == 0  # ... but genuinely similar: kept
    assert (path.n_subclusters, path.largest_subcluster) == (1, 3)


def test_incremental_cc_merge_handles_all_split_shapes(spark):
    """Deterministic split-shape coverage on top of the hypothesis
    differential (test_properties): delta edges that (a) join two base
    clusters, (b) attach a fresh batch doc to a base cluster, (c) form a
    batch-only cluster, and (d) connect two base docs that had no base
    edge, must all land on from-scratch labels.  Batch = doc_id%10==3."""
    # base docs: 1,2 (cluster via base edge), 10,11 (cluster), 20 (isolated)
    # batch docs: 3, 13, 23
    pairs = spark.createDataFrame(
        [
            (1, 2),  # base edge → base cluster {1,2}
            (10, 11),  # base edge → base cluster {10,11}
            (2, 3),  # (b) batch doc 3 attaches to {1,2}
            (3, 10),  # (a) ... and welds {1,2,3} to {10,11}
            (13, 23),  # (c) batch-only cluster {13,23}
            (13, 20),  # (d) batch edge pulls in base doc 20 (no base edges)
        ],
        "doc_a long, doc_b long",
    )
    inc = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.incremental_cc_from(pairs).collect()}
    full = {r.node: r.cluster_id
            for r in dedup.connected_components(pairs).collect()}
    assert {k: v[0] for k, v in inc.items()} == full
    assert inc[1] == (1, 1) and inc[11][0] == 1 and inc[3][0] == 1
    assert inc[13] == (13, 1) and inc[23][0] == 13 and inc[20][0] == 13
    for d, (cl, canon) in inc.items():
        assert canon == (1 if d == cl else 0)


def test_pq_index_artifacts_cached_per_session_and_fixture(spark, sf_dir):
    """The IVF/PQ index build must run once per (session, fixture): a
    second call returns the SAME DataFrame objects (no retrain), and
    clearing the session cache forces a rebuild (VERDICT r11 #2)."""
    from cocktails_data_engineering_spark import caching
    from cocktails_data_engineering_spark.operators import pq

    caching.clear(spark)
    first = pq.pq_index_artifacts(spark, sf_dir)
    again = pq.pq_index_artifacts(spark, sf_dir)
    assert first["enc"] is again["enc"] and first["cb"] is again["cb"]
    coarse1 = pq.coarse_quantizer(spark, sf_dir)
    assert pq.coarse_quantizer(spark, sf_dir)["cents1"] is coarse1["cents1"]
    caching.clear(spark)
    rebuilt = pq.pq_index_artifacts(spark, sf_dir)
    assert rebuilt["enc"] is not first["enc"]
    # values are deterministic: the rebuild carries identical codes
    a = sorted(tuple(r) for r in first["enc"].collect())
    b = sorted(tuple(r) for r in rebuilt["enc"].collect())
    assert a == b


def test_session_cache_is_an_attribute_not_a_module_global(spark):
    """ADVICE r11: the cache must live ON the session object (collectable
    cycle) — not in a module-level WeakKeyDictionary whose values pin the
    session alive forever."""
    from cocktails_data_engineering_spark import caching

    sentinel = object()
    got = caching.get_or_build(spark, ("t", "k"), lambda: sentinel)
    assert got is sentinel
    assert getattr(spark, caching._ATTR)[("t", "k")] is sentinel
    caching.clear(spark)
    assert ("t", "k") not in getattr(spark, caching._ATTR)


def test_reverified_drop_set_spares_fluke_victims(spark):
    """The corpus consequence of the remediation loop: under naive
    transitive dedup the fluke-welded 4-cluster keeps only doc 1
    (dropping 2, 3, 4); after reverification the refuted fluke splits
    the cluster and each genuine pair keeps its own canonical — docs 3
    survives, only 2 and 4 (true near-dups of 1 and 3) are dropped."""
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),
            (3, "p q r s t u v w"),
            (4, "p q r s t u v y"),
        ],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    parts = dedup._reverify_parts(pairs, dedup._shingles(docs))
    drop = {
        r.node for r in parts["members"].filter(F.col("node") != F.col("new_label")).collect()
    }
    assert drop == {2, 4}  # naive CC would drop {2, 3, 4}
