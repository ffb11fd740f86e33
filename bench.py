"""Benchmark harness — the driver's per-round feedback loop.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced through the noop datasource sink so the full plan
executes (a bare ``count()`` lets Catalyst prune projections); timings are
wall-clock per query on a shared warmed SparkSession, matching how a real
deployment would run a query mix.  Failures are recorded as ``null`` and
never abort the run — the driver needs the line either way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cocktails_data_engineering_spark.session import get_spark
    from cocktails_data_engineering_spark.plans import queries as plans

    spark = get_spark("cocktails_spark_bench")

    qs = plans.all_queries()
    timings: dict[str, float | None] = {}

    # Warm the JVM + parquet footers once so the first measured query isn't
    # charged for session spin-up.
    try:
        from cocktails_data_engineering_spark.sources.tables import load

        load(spark, sf_dir, "lineitem").write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    total = 0.0
    for name, fn in sorted(qs.items()):
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            timings[name] = round(dt, 3)
            total += dt
        except Exception as exc:  # noqa: BLE001 — bench must emit a line regardless
            timings[name] = None
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total wall-clock over all registered queries (noop sink)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
