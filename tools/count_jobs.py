"""Count the Spark JOBS a registered query submits, plus wall-clock —
the attribution metric for optimization r14's job-barrier work (guide
§1.2: at sf0.1 every sub-second job is dominated by fixed scheduling
cost, so "how many jobs" is the plan-shape number wall-clock noise
cannot hide).

Each query runs inside its own job group; the count is
``statusTracker().getJobIdsForGroup(group)`` after the noop-sink action
completes.  NOTE: queries serving session caches submit their build jobs
on first touch — run the same query list in the same order before/after
so cache-build attribution is identical.

Usage: python tools/count_jobs.py name [name ...]
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/count_jobs.py dedup_clusters
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from cocktails_data_engineering_spark.plans import queries as plans
    from cocktails_data_engineering_spark.session import get_spark

    spark = get_spark("count_jobs")
    sc = spark.sparkContext
    qs = plans.all_queries()
    out = {}
    for name in names:
        if name not in qs:
            print(f"== {name}: UNKNOWN", file=sys.stderr)
            continue
        # Job-group counting misses jobs submitted from OTHER threads
        # (streaming micro-batch threads, ThreadPoolExecutor builders), so
        # bracket the query with two marker jobs and count by global job-id
        # delta — job ids are allocated monotonically per SparkContext.
        def marker() -> int:
            g = f"cj_marker_{time.monotonic_ns()}"
            sc.setJobGroup(g, "marker")
            spark.range(1).write.format("noop").mode("overwrite").save()
            sc.setJobGroup(None, None)
            ids = sc.statusTracker().getJobIdsForGroup(g)
            return max(ids)

        before = marker()
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        after = marker()
        n = after - before - 1
        out[name] = {"n_jobs": n, "sec": dt}
        print(f"{name}: {n} jobs, {dt}s")
    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
