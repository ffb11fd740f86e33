"""Oracle result-type audit (judge-style Arrow-typed fetch).

For every registered oracle: execute the SQL in DuckDB, fetch the Arrow
schema, and (a) flag columns that cannot round-trip a pandas fetch
losslessly (HUGEINT / decimal precision > 18), (b) compare type KINDS
against the Spark query's (lazy) result schema.  This is the check that
would have caught CORRECTNESS_r04's three red rows in round 1.

Usage: python tools/audit_oracle_types.py [name ...]   (no names = all)
"""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

from cocktails_data_engineering_spark.functions.typekinds import (
    audit_arrow_schema,
    kind_mismatches,
)

spark = SparkSession.builder.master("local[8]").appName("type-audit").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

qs, os_ = e.queries(), e.oracle_sql()
names = sys.argv[1:] or sorted(os_)

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")

flagged = []
for name in names:
    if name not in os_:
        continue
    tbl = con.execute(os_[name]).arrow()
    problems = audit_arrow_schema(tbl.schema)
    try:
        sschema = qs[name](spark, sf).schema
        problems += kind_mismatches(sschema, tbl.schema)
    except Exception as ex:  # noqa: BLE001 — report, keep auditing
        problems += [f"spark schema build failed: {ex}"]
    if problems:
        flagged.append(name)
        print("FLAG", name)
        for p in problems:
            print("   ", p)
print("FLAGGED:", flagged)
spark.stop()
