"""Benchmark harness — the driver's per-round feedback loop.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``.  The FINAL
stdout line is ONE compact JSON object (kept well under 2000 chars — the
driver captures only a bounded tail)::

    {"metric": "...", "value": <headline_sec>, "unit": "sec",
     "queries": {<headline queries only>}, "sf": 0.1,
     "total_all_queries_sec": ..., "n_queries": ..., "failed": [...]}

The full per-query timing map (every registered query) is written to
``BENCH_DETAIL.json`` next to this script and also printed as an earlier
stdout line for the log.

Measurement order (round-8 method change, fixing the r6/r7 session-bloat
artifact where the 274-query sweep inflated later timings up to 6.7x):

1. **Headline first, on a clean session.**  The fixed 35-query core set
   is timed min-of-``passes`` immediately after warm-up, BEFORE the full
   sweep pollutes the JVM/session with 270+ plans of state.  These are
   the numbers the driver compares round-over-round.
2. **Full sweep, single pass.**  Every registered query, diagnostic
   timings only (recorded separately in ``sweep_queries``).
3. **Fresh-session spot-check.**  The top-10 slowest sweep queries are
   re-timed once on a NEW SparkSession (old one stopped — drops cached
   relations, temp state, and listener backlog).  ``spotcheck_fresh`` in
   BENCH_DETAIL.json separates real plan cost from sweep-order noise.

Each query is forced through the noop datasource sink so the full plan
executes (a bare ``count()`` lets Catalyst prune projections); timings are
wall-clock per query.  Failures are recorded as ``null`` and never abort
the run — but a failed HEADLINE query makes ``value`` null (with the
culprits listed in ``failed``) rather than silently summing it as 0.0 and
looking faster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline metric sums a FIXED core set (SURVEY §2.3's checklist
# shapes) so the number stays comparable across rounds as the registered
# surface grows; every registered query still gets a per-query timing.
HEADLINE = (
    "q1_pricing_summary",
    "scan_project",
    "filter_blocklist",
    "filter_status",
    "route_by_suffix",
    "rewrite_relative_urls",
    "sanitize_filename",
    "md5_name",
    "distinct_links",
    "enumerate_ids",
    "edges_from_children",
    "anti_join_visited",
    "equi_join_vertex_resolve",
    "semi_join_active",
    "broadcast_join_dims",
    "union_frontier",
    "groupby_agg_depth",
    "agg_multi",
    "rollup_priority_status",
    "cube_flag_status",
    "window_rank_topk",
    "window_running",
    "sort_limit_topk",
    "intersect_segments",
    "except_unvisited",
    "json_extract_props",
    "date_trunc_hourly",
    "session_window_agg",
    "approx_distinct_users",
    "exact_dedup_docs",
    "minhash_near_dedup",
    "cosine_topk",
    "tokenize_wordcount",
    "jdbc_roundtrip",
    "bfs_crawl_sim",
)

SPOTCHECK_N = 10


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _passes_from_argv(argv: list[str]) -> int:
    """``--passes N`` (or ``SPARK_GRAFT_BENCH_PASSES``): headline queries are
    timed N times and the per-query MIN is kept.  Wall-clock on this shared
    host is contention-polluted (r3's bench read 3-10x over standalone
    min-of-3 re-timings; two clean-session r8 runs differed 20.8 vs 25.0 s
    on ambient load alone); min-of-passes recovers the noise floor for the
    number the driver actually compares.  Default 3 (~20 s extra runtime
    buys the headline two more chances to dodge a load spike)."""
    if "--passes" in argv:
        return max(1, int(argv[argv.index("--passes") + 1]))
    # Default raised 3 → 5 in round 12 (VERDICT r11 #3/#8): r11's real
    # aggregate wins were invisible in the recorded headline because the
    # box ran ~30% hotter during the official run; two extra passes cost
    # ~25 s and buy two more chances per query to dodge ambient load.
    return max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5")))


def _loadavg() -> float | None:
    """1-minute load average — recorded alongside timings so cross-round
    headline deltas can be read against ambient contention on this shared
    host (VERDICT r11 #8) instead of being confounded by it."""
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def _time_query(fn, spark, sf_dir: str) -> float:
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def _warm(spark, sf_dir: str) -> None:
    """Warm the JVM + parquet footers + Python worker daemons once so the
    first measured query isn't charged for session spin-up.

    The Python-side warm-ups matter for single-pass timings: the first
    Arrow/Python stage in a session forks the worker daemon pool (~8 s on
    this host for the DataSource path, measured standalone: pass0 8.97 s vs
    pass1 0.75 s for ``python_datasource_scan``).  Each entry point below
    exercises a distinct worker module, so whichever Python-backed query the
    sweep hits first is timed at steady state, not daemon cold-start."""
    try:
        from cocktails_data_engineering_spark.sources.tables import TABLES, load

        # One noop scan per table: parquet footers + column metadata are
        # session-cached on first touch, so without this the first headline
        # query that reads a given table is charged its footer I/O (the
        # r10→r11 headline audit measured q1/broadcast_join_dims paying
        # first-touch scan overhead even at min-of-3).  Warm-up precedes
        # timing by this harness's documented method.
        for t in TABLES:
            load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    try:  # Python DataSource reader workers
        from cocktails_data_engineering_spark.sources.python_source import synth_feed

        synth_feed(spark, rows=64).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    try:  # Arrow-batched pandas-UDF workers (mapInPandas path)
        spark.range(64).mapInPandas(
            lambda it: it, schema="id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = _passes_from_argv(sys.argv[1:])

    from cocktails_data_engineering_spark.session import get_spark
    from cocktails_data_engineering_spark.plans import queries as plans

    spark = get_spark("cocktails_spark_bench")
    qs = plans.all_queries()
    _warm(spark, sf_dir)

    # ---- Phase 1: headline set FIRST, clean session, min-of-passes ----
    load_start = _loadavg()
    headline_t: dict[str, float | None] = {}
    headline_loads: list[float] = []
    for _ in range(passes):
        la = _loadavg()
        if la is not None:
            headline_loads.append(la)
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                headline_t[name] = None
                continue
            try:
                t = _time_query(fn, spark, sf_dir)
            except Exception as exc:  # noqa: BLE001 — bench must emit a line regardless
                headline_t.setdefault(name, None)
                print(f"bench: headline {name} failed: {exc}", file=sys.stderr)
                continue
            prev = headline_t.get(name)
            headline_t[name] = t if prev is None else min(prev, t)

    # ---- Phase 2: full sweep, single pass (diagnostic timings) ----
    sweep_t: dict[str, float | None] = {}
    for name, fn in sorted(qs.items()):
        try:
            sweep_t[name] = _time_query(fn, spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            sweep_t[name] = None
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    # ---- Phase 3: fresh-session spot-check of the slowest sweep queries ----
    spotcheck: dict[str, float | None] = {}
    slowest = sorted(
        (n for n, t in sweep_t.items() if t is not None),
        key=lambda n: sweep_t[n],
        reverse=True,
    )[:SPOTCHECK_N]
    if slowest:
        try:
            spark.stop()
            # Python-side memoized state survives spark.stop(); drop it so
            # "fresh session" means fresh model training too, or the
            # spot-check under-reports queries whose sweep time included
            # training (the misattribution this phase exists to catch).
            from cocktails_data_engineering_spark.operators import dedup, ml

            ml._TRAIN_CACHE.clear()
            # session-keyed, but clear anyway: dead-session checkpoints
            # must never be reachable in the fresh-session phase
            dedup._CANDS_CACHE.clear()
            spark = get_spark("cocktails_spark_bench_spotcheck")
            _warm(spark, sf_dir)
            for name in slowest:
                try:
                    spotcheck[name] = _time_query(qs[name], spark, sf_dir)
                except Exception as exc:  # noqa: BLE001
                    spotcheck[name] = None
                    print(f"bench: spotcheck {name} failed: {exc}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"bench: spotcheck phase failed: {exc}", file=sys.stderr)

    # Canonical per-query map: headline keys report their clean-session
    # min; everything else reports its sweep timing.
    timings: dict[str, float | None] = dict(sweep_t)
    for name in HEADLINE:
        if name in headline_t:
            if headline_t[name] is None and sweep_t.get(name) is not None:
                # Headline pass failed but the sweep ran it fine (e.g. a
                # transient first-pass error): report the sweep timing
                # rather than nulling a working query (advice r8).
                print(
                    f"bench: headline {name} failed in phase 1; "
                    f"using sweep timing {sweep_t[name]}",
                    file=sys.stderr,
                )
                continue
            timings[name] = headline_t[name]

    failed = sorted(n for n, t in timings.items() if t is None)
    failed_headline = [n for n in HEADLINE if timings.get(n) is None]
    ran = [t for t in timings.values() if t is not None]
    headline: float | None
    if failed_headline:
        headline = None  # a broken headline query must read as a failure, not a speedup
    else:
        headline = round(sum(timings[n] for n in HEADLINE), 3)

    detail = {
        "sf": _sf_of(sf_dir),
        "headline_sec": headline,
        "load_avg_1m": {
            "start": load_start,
            "headline_passes": headline_loads,
            "end": _loadavg(),
        },
        "method": (
            "headline timed first on a clean session (min of "
            f"{passes} passes), then full single-pass sweep, then top-"
            f"{SPOTCHECK_N} slowest re-timed on a fresh session"
        ),
        "total_all_queries_sec": round(sum(ran), 3),
        "n_queries": len(timings),
        "n_failed": len(failed),
        "failed": failed,
        "queries": timings,
        "sweep_queries": sweep_t,
        "spotcheck_fresh": spotcheck,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"bench: could not write {detail_path}: {exc}", file=sys.stderr)
    # Full map on an EARLY stdout line (for the log); the final line stays compact.
    print(json.dumps({k: v for k, v in detail.items() if k != "sweep_queries"}, sort_keys=True))

    summary = {
        "metric": (
            f"headline wall-clock, fixed {len(HEADLINE)}-query SURVEY core set, "
            f"timed first on a clean session, min of {passes} passes"
        ),
        "value": headline,
        "unit": "sec",
        "load_avg_1m": {
            "start": load_start,
            "headline_passes": headline_loads,
            "end": _loadavg(),
        },
        "queries": {n: timings.get(n) for n in HEADLINE},
        "sf": _sf_of(sf_dir),
        "total_all_queries_sec": round(sum(ran), 3),
        "n_queries": len(timings),
        "failed": failed[:20],
    }
    line = json.dumps(summary)
    if len(line) > 1900:  # hard guard: the driver keeps only a 2000-char tail
        summary.pop("queries")
        line = json.dumps(summary)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
