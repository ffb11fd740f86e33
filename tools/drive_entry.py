"""Driver-style harness: plain SparkSession, no engine-side tuning."""
import sys, math
from collections import Counter
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

from cocktails_data_engineering_spark.functions.typekinds import (
    audit_arrow_schema,
    kind_mismatches,
)

spark = SparkSession.builder.master("local[8]").appName("driver-sim").config("spark.ui.showConsoleProgress","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows))
print("ENTRY schema:", df.columns)
print("ENTRY first:", rows[0])

qs, os_ = e.queries(), e.oracle_sql()
print("queries:", len(qs), "oracles:", len(os_))

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")

def norm(v):
    if isinstance(v, float) and math.isnan(v): return "NaN"
    return v

bad = []
for name in sorted(os_):
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
    if not ok: bad.append(name)
print("MISMATCHES:", bad)
spark.stop()
