"""Hot-bucket control in the LSH band joins: a boilerplate cluster (many
copies of one page) must produce LINEAR candidate fan-out (star around the
bucket's min doc), not bucket² pairs — while keeping the cluster fully
connected for the connected-components finalizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.dedup import (
    HOT_BUCKET_CAP,
    _shingles,
    connected_components,
    minhash_candidates_from,
    simhash_pairs,
)

N_BOILER = 3 * HOT_BUCKET_CAP  # decisively over the cap


def _boilerplate_docs(spark):
    """N_BOILER identical pages + a handful of unrelated docs."""
    boiler = "breaking news subscribe to our newsletter terms privacy contact about careers sitemap"
    rows = [(i, boiler) for i in range(N_BOILER)]
    rows += [
        (1000, "a completely different document about cocktails and data engineering pipelines"),
        (1001, "spark catalyst optimizer chooses the physical plan for declarative queries here"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_hot_bucket_star_fanout(spark):
    docs = _boilerplate_docs(spark)
    pairs = minhash_candidates_from(_shingles(docs)).collect()
    boiler_pairs = [(r.doc_a, r.doc_b) for r in pairs if r.doc_a < N_BOILER and r.doc_b < N_BOILER]
    # linear star, not quadratic: N-1 pairs all anchored at min doc 0
    assert len(boiler_pairs) == N_BOILER - 1
    assert {a for a, _ in boiler_pairs} == {0}
    assert {b for _, b in boiler_pairs} == set(range(1, N_BOILER))


def test_minhash_hot_bucket_keeps_cluster_connected(spark):
    docs = _boilerplate_docs(spark)
    pairs = minhash_candidates_from(_shingles(docs))
    labels = {
        r.node: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert {labels[i] for i in range(N_BOILER)} == {0}  # one component, min label


def test_simhash_hot_bucket_star_fanout(spark):
    docs = _boilerplate_docs(spark)
    pairs = simhash_pairs(docs).collect()
    boiler_pairs = [(r.doc_a, r.doc_b) for r in pairs if r.doc_a < N_BOILER and r.doc_b < N_BOILER]
    assert len(boiler_pairs) == N_BOILER - 1
    assert {a for a, _ in boiler_pairs} == {0}
    # identical docs ⇒ identical signatures ⇒ hamming 0 on every star edge
    assert all(r.hamming == 0 for r in pairs if r.doc_a == 0 and r.doc_b < N_BOILER)


def test_cold_buckets_still_all_pairs(spark):
    """Under the cap, semantics are unchanged: a small group of identical
    docs yields every pair, not a star."""
    n = 5
    rows = [(i, "tiny duplicated page body with enough words to form shingles here") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r.doc_a, r.doc_b) for r in minhash_candidates_from(_shingles(docs)).collect()}
    assert pairs == {(a, b) for a in range(n) for b in range(n) if a < b}


def test_split_leakage_audit_invariants(spark, sf_dir):
    """The holdout partitions the corpus (~12.5% expected), contamination
    counts are bounded by the holdout population, and every counted
    cross pair really does straddle the split (re-derived from the
    candidate set independently)."""
    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.operators.dedup import (
        TEST_SPLIT_HEX_BOUND,
        minhash_candidates,
        split_leakage_audit,
    )
    from cocktails_data_engineering_spark.sources.tables import load

    rows = {r["lang"]: r for r in split_leakage_audit(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_test = sum(r["n_test_docs"] for r in rows.values())
    assert 0 < n_test < n_docs
    for r in rows.values():
        assert 0 <= r["n_contaminated"] <= r["n_test_docs"]
        assert r["n_contaminated"] <= r["n_cross_pairs"]
        assert abs(r["contamination_rate"] - r["n_contaminated"] / r["n_test_docs"]) < 1e-6

    # independent recount of straddling pairs (split derived inline)
    split_col = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        < TEST_SPLIT_HEX_BOUND,
        "test",
    ).otherwise("train")
    lab = docs.select("doc_id", split_col.alias("split"))
    cands = minhash_candidates(spark, sf_dir)
    n_cross = (
        cands.join(lab.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
        .join(lab.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert n_cross == sum(r["n_cross_pairs"] for r in rows.values())


def test_winnowing_locality_guarantee(spark, tmp_path):
    """Winnowing's defining property: documents sharing a long contiguous
    word run MUST share fingerprints (every full window inside the run
    selects the same minimum), while vocabulary-disjoint docs share none."""
    import os

    from cocktails_data_engineering_spark.operators.dedup import (
        winnowing_fingerprint_pairs,
    )

    run = " ".join(f"tok{i}" for i in range(40))  # shared 40-word run
    rows = [
        (1, "alpha beta " + run + " gamma delta", "en", "web", 300),
        (2, "omega sigma " + run + " tau kappa", "en", "web", 300),
        (3, " ".join(f"other{i}" for i in range(50)), "en", "web", 300),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnowing_fingerprint_pairs(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert all(3 not in p for p in pairs)


def test_chain_edge_audit_flags_exactly_uncorroborated_edges(spark, sf_dir):
    """Every emitted edge must (a) be a real candidate pair, (b) sit in a
    cluster of size >= 3, and (c) have endpoints with NO common candidate
    neighbor — verified against a Python adjacency reference built from
    the same candidate set."""
    from cocktails_data_engineering_spark.operators.dedup import (
        chain_edge_audit,
        minhash_candidates,
    )

    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidates(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    # Python reference components (union-find)
    parent: dict[int, int] = {n: n for n in adj}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in adj:
        comp.setdefault(find(n), []).append(n)

    got = chain_edge_audit(spark, sf_dir).collect()
    expected = {
        (a, b)
        for a, b in pairs
        if len(comp[find(a)]) >= 3 and not (adj[a] & adj[b] - {a, b})
    }
    assert {(r.doc_a, r.doc_b) for r in got} == expected
    for r in got:
        assert r.cluster_size == len(comp[find(r.doc_a)])
        assert r.cluster_id == min(comp[find(r.doc_a)])


def test_chain_edge_audit_on_planted_graph(spark, monkeypatch):
    """Planted topology (the small driver fixtures contain no size->=3
    chained clusters, so this pins the predicate itself): a 3-path emits
    both of its edges, a triangle emits none, an isolated pair is
    excluded by the size gate, and a triangle with a pendant emits
    exactly the pendant edge."""
    from cocktails_data_engineering_spark.operators import dedup

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3),                      # path: both edges weak
            (10, 11), (10, 12), (11, 12),        # triangle: all corroborated
            (20, 21),                            # pair: size-2, excluded
            (30, 31), (30, 32), (31, 32), (31, 33),  # triangle + pendant 33
        ],
        "doc_a long, doc_b long",
    )
    monkeypatch.setattr(dedup, "minhash_candidates", lambda s, d: pairs)
    got = {
        (r.doc_a, r.doc_b): (r.cluster_id, r.cluster_size)
        for r in dedup.chain_edge_audit(spark, "unused").collect()
    }
    assert got == {
        (1, 2): (1, 3),
        (2, 3): (1, 3),
        (31, 33): (30, 4),
    }
