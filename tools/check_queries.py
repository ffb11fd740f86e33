"""Spot-check a subset of registered queries against the DuckDB oracle.

Usage: python tools/check_queries.py name1 name2 ...   (no names = all)
Same comparison as drive_entry.py (sorted-column value multiset), but
skips the entry() smoke and lets you iterate on one query in seconds.
"""
import math
import os
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

from cocktails_data_engineering_spark.functions.typekinds import (
    audit_arrow_schema,
    kind_mismatches,
)

spark = SparkSession.builder.master("local[8]").appName("check-subset").config("spark.ui.showConsoleProgress","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

qs, os_ = e.queries(), e.oracle_sql()
names = sys.argv[1:] or sorted(os_)

# Honors the same knob as conftest/parity (a hard-coded dir here silently
# re-ran "other-fixture" spot checks at sf0.01).
sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
if not os.path.isdir(sf):
    raise SystemExit(f"check_queries: fixture dir does not exist: {sf}")
print(f"fixture: {sf}")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


bad = []
for name in names:
    if name not in os_:
        print("SKIP", name, "(no oracle)" if name in qs else "(unknown)")
        continue
    sdf = qs[name](spark, sf)
    scols = sorted(sdf.columns)
    idx = [sdf.columns.index(c) for c in scols]
    s = Counter(tuple(norm(r[i]) for i in idx) for r in sdf.collect())
    arrow_schema = con.execute(os_[name]).arrow().schema
    type_problems = audit_arrow_schema(arrow_schema) + kind_mismatches(
        sdf.schema, arrow_schema
    )
    res = con.execute(os_[name])
    dcols = sorted(d[0] for d in res.description)
    didx = [[d[0] for d in res.description].index(c) for c in dcols]
    d = Counter(tuple(norm(r[i]) for i in didx) for r in res.fetchall())
    ok = (scols == dcols) and (s == d) and not type_problems
    print(("OK  " if ok else "FAIL"), name, sum(s.values()), "rows")
    if not ok:
        bad.append(name)
        for p in type_problems:
            print("  type:", p)
        if scols != dcols:
            print("  spark cols:", scols, "\n  duck  cols:", dcols)
        else:
            only_s = list((s - d).items())[:3]
            only_d = list((d - s).items())[:3]
            print("  only-spark:", only_s, "\n  only-duck :", only_d)
print("MISMATCHES:", bad)
spark.stop()
