"""Measure per-query shuffle volume via the Spark status REST API.

Wall-clock ratios (SCALE.md's main table) can hide a superlinear shuffle
behind local[32] overhead; shuffle bytes can't — they are THE currency of
a 1000-executor cluster.  For each named query this runs one warmed pass
at the given SF dir and reports the stages it scheduled plus their summed
shuffle write / shuffle read / input bytes, by diffing the app's
completed-stage list around the action.

Usage: SPARK_GRAFT_SF_DIR=... python tools/shuffle_bytes.py name [name ...]
Prints one JSON line: {"sf_dir": ..., "queries": {name: {...bytes...}}}
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(spark) -> dict[int, dict]:
    base = spark.sparkContext.uiWebUrl
    if base is None:
        raise SystemExit(
            "Spark UI is disabled in this session (spark.ui.enabled=false); "
            "the status REST API needs it — run this tool in a fresh process"
        )
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        data = json.load(r)
    return {(s["stageId"], s["attemptId"]): s for s in data}


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: shuffle_bytes.py query [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # FORCE (not setdefault): the tool is useless without the UI store,
    # and an inherited SPARK_GRAFT_UI=false would surface as an opaque
    # "unknown url type: 'None/api/...'" deep in urllib (r9 self-review).
    os.environ["SPARK_GRAFT_UI"] = "true"

    from cocktails_data_engineering_spark.plans import queries as plans
    from cocktails_data_engineering_spark.session import get_spark
    from cocktails_data_engineering_spark.sources.tables import load

    spark = get_spark("shuffle_bytes")
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.all_queries()
    load(spark, sf_dir, "lineitem").write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        before = _stages(spark)
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.monotonic() - t0, 2)
        time.sleep(0.5)  # let the UI store settle
        after = _stages(spark)
        new = [s for k, s in after.items() if k not in before]
        out[name] = {
            "wall_sec": wall,
            "n_stages": len(new),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 2
            ),
            "input_mb": round(sum(s.get("inputBytes", 0) for s in new) / 1e6, 2),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
