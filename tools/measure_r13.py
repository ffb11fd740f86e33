"""Round-13 scale measurements (SCALE.md evidence), one scenario per run.

Scenarios (pass as argv[1]):
  pq_build   — fresh session, durable store EMPTY: first retrieval head
               pays the shared index build AND publishes it.
  pq_serve   — fresh session, durable store POPULATED: every head must
               load the parquet index (seconds, not minutes).
  reverify   — fresh session: chain_edge_reverify cold, reverified
               corpus (shares the cached remediation core), reverify
               again (repeat ≤ target), chain_edge_audit (shares weak).
  ingest     — fresh session: incremental_reverified_ingest cold
               (bootstraps candidates + base labels), then again
               (ingest-only: screen + verify + merge on cached state).
  newrows    — fresh session: dsir_importance_resample and
               semantic_dedup_clusters (VERDICT r12 #6).

Usage:
  SPARK_GRAFT_SF_DIR=/tmp/sf100_tiled python tools/measure_r13.py <scenario>
  (pq scenarios read SPARK_GRAFT_INDEX_DIR for the store location)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENARIOS = {
    "pq_build": ["ivfadc_topk"],
    "pq_serve": [
        "ivfadc_topk",
        "ivfadc_rerank_topk",
        "ivfpq_residual_topk",
        "pq_code_usage_audit",
    ],
    "reverify": [
        "chain_edge_reverify",
        "dedup_canonical_corpus_reverified",
        "chain_edge_reverify#2",
        "chain_edge_audit",
    ],
    "ingest": [
        "incremental_reverified_ingest",
        "incremental_reverified_ingest#2",
    ],
    "newrows": ["dsir_importance_resample", "semantic_dedup_clusters"],
    "stream_ingest": ["stream_dedup_ingest_labels"],
}


def main() -> None:
    scenario = sys.argv[1]
    names = SCENARIOS[scenario]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf100_tiled")

    from cocktails_data_engineering_spark.plans import queries as plans
    from cocktails_data_engineering_spark.session import get_spark

    spark = get_spark(f"measure_r13_{scenario}")
    qs = plans.all_queries()
    out: dict[str, float] = {}
    for label in names:
        name = label.split("#")[0]
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[label] = round(time.monotonic() - t0, 2)
        print(f"{label}: {out[label]} s", flush=True)
    print(json.dumps({"scenario": scenario, "sf_dir": sf_dir, "sec": out,
                      "load_1m": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
