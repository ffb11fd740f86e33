"""Robust per-query timing: run every registered query N times at the
given SF dir on one warmed session, report the MIN wall-clock per query
(noise floor on a shared host).  Not the driver bench — a diagnosis tool.

Usage: python tools/time_queries.py [passes] [name ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cocktails_data_engineering_spark.plans import queries as plans
    from cocktails_data_engineering_spark.session import get_spark
    from cocktails_data_engineering_spark.sources.tables import load

    spark = get_spark("time_queries")
    qs = plans.all_queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    load(spark, sf_dir, "lineitem").write.format("noop").mode("overwrite").save()

    best: dict[str, float | None] = {}
    for _ in range(passes):
        for name, fn in sorted(qs.items()):
            t0 = time.monotonic()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.monotonic() - t0, 3)
                prev = best.get(name)
                best[name] = dt if prev is None else min(prev, dt)
            except Exception as exc:  # noqa: BLE001
                best.setdefault(name, None)
                print(f"{name} FAILED: {exc}", file=sys.stderr)

    for name, dt in sorted(best.items(), key=lambda kv: -(kv[1] or 1e9)):
        print(f"{dt if dt is not None else 'FAIL':>8}  {name}")
    ok = [v for v in best.values() if v is not None]
    print(json.dumps({"n": len(best), "total_min_sec": round(sum(ok), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
