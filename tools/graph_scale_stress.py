"""Scale-stress the iterative graph operators on a NON-TRIVIAL graph.

The registered fixture queries run on ≤500-node derived graphs — fine for
correctness, vacuous for scaling claims (VERDICT r8 #3).  This tool builds
a seeded Barabási–Albert preferential-attachment graph (the degree
distribution real link graphs have: a few massive hubs, a long tail — the
skew that actually stresses shuffle key distributions), runs each
operator's shared core (`*_over` in operators/graph.py) at 1x and 10x
edges, and prints per-operator wall times + the 10x/1x ratio for SCALE.md.

Graph sizes: 1x = 50k nodes x m=10 -> ~500k directed edges;
10x = 500k nodes x m=10 -> ~5M edges (both node AND edge count scale,
matching how a crawl frontier actually grows).

Usage: python tools/graph_scale_stress.py [n_nodes_1x] [m]
"""
from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 20260815


def ba_edges(n_nodes: int, m: int, seed: int) -> "pd.DataFrame":  # noqa: F821
    """Deterministic Barabási–Albert: each new node attaches m edges to
    existing nodes sampled proportional to degree (the repeated-endpoint
    list trick).  Python-loop generation is the honest way to get true
    preferential attachment (it's inherently sequential); the OPERATORS
    under test never see this loop — they read the parquet."""
    import pandas as pd

    rng = random.Random(seed)
    endpoints: list[int] = list(range(m))  # seed clique stubs
    src: list[int] = []
    dst: list[int] = []
    for v in range(m, n_nodes):
        targets = set()
        while len(targets) < m:
            targets.add(endpoints[rng.randrange(len(endpoints))])
        for t in targets:
            src.append(v)
            dst.append(t)
            endpoints.append(v)
            endpoints.append(t)
    return pd.DataFrame({"src": src, "dst": dst})


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.operators.graph import (
        hits_over,
        kcore_over,
        lpa_over,
        pagerank_over,
    )
    from cocktails_data_engineering_spark.session import get_spark

    spark = get_spark("graph_scale_stress")
    tmp = tempfile.mkdtemp(prefix="graph_stress_")
    results: dict[str, dict] = {}

    for tier, n_nodes in (("1x", n1), ("10x", n1 * 10)):
        pdf = ba_edges(n_nodes, m, SEED)
        path = os.path.join(tmp, f"edges_{tier}.parquet")
        spark.createDataFrame(pdf).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
        directed = spark.read.parquet(path)
        # materialize the undirected form OUTSIDE the timed region: the
        # symmetrize+distinct is input prep, not the operator under test
        upath = os.path.join(tmp, f"edges_und_{tier}.parquet")
        (
            directed.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .unionAll(
                directed.select(F.col("dst").alias("a"), F.col("src").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .write.mode("overwrite")
            .parquet(upath)
        )
        undirected = spark.read.parquet(upath)
        n_edges = directed.count()
        print(f"--- {tier}: {n_nodes} nodes, {n_edges} directed edges", file=sys.stderr)
        ops = {
            "pagerank": lambda: pagerank_over(spark, directed),
            "hits": lambda: hits_over(spark, directed),
            "kcore": lambda: kcore_over(spark, undirected),
            "lpa": lambda: lpa_over(spark, undirected),
        }
        for name, run in ops.items():
            t0 = time.monotonic()
            run().write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 2)
            results.setdefault(name, {})[tier] = dt
            results[name][f"n_edges_{tier}"] = n_edges
            print(f"{name:10s} {tier:3s} {dt:8.2f}s", file=sys.stderr)

    for name, r in results.items():
        r["ratio"] = round(r["10x"] / r["1x"], 2) if r.get("1x") else None
    print(json.dumps({"seed": SEED, "m": m, "n_nodes_1x": n1, "ops": results}))


if __name__ == "__main__":
    main()
