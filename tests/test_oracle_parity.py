"""Differential test: every oracle-expressible query must match DuckDB
exactly — row count, column names, and values (order-insensitive).

This replicates (strictly: exact value equality, stronger than a hash)
the driver's CORRECTNESS check so mismatches surface before a round ends.
"""

from __future__ import annotations

import math
import os

import pytest

from cocktails_data_engineering_spark.functions.typekinds import (
    audit_arrow_schema,
    kind_mismatches,
)
from cocktails_data_engineering_spark.plans.queries import all_oracles, all_queries

# Cross-engine rounding ties are DATA-DEPENDENT (the r6 ewma bug was
# invisible at sf0.01 and red at sf0.001), so parity runs against BOTH
# small fixtures by default.  Defaults derive from the SAME knob the rest
# of the suite uses (conftest's SPARK_GRAFT_TEST_SF_DIR): that fixture's
# sibling sf0.001/sf0.01 dirs, so relocated fixtures keep parity honest.
# Override with a colon-separated SPARK_GRAFT_PARITY_SF_DIRS to pin a
# single fixture (e.g. while iterating on one query).
_TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
_SF_ROOT = os.path.dirname(_TEST_SF_DIR.rstrip("/")) or "/root/testdata"
_DEFAULT_PARITY = ":".join(
    dict.fromkeys(  # ordered de-dup: the conftest dir itself, then sf0.01
        [_TEST_SF_DIR.rstrip("/"),
         os.path.join(_SF_ROOT, "sf0.001"),
         os.path.join(_SF_ROOT, "sf0.01")]
    )
)
_PARITY_OVERRIDE = os.environ.get("SPARK_GRAFT_PARITY_SF_DIRS")
if _PARITY_OVERRIDE is not None:
    # An EXPLICIT override must fail loudly on a typo'd/moved path — a
    # silent fallback to the defaults would report parity green against
    # the wrong data while the developer believes the pinned fixture ran.
    _PARITY_DIRS = [p for p in _PARITY_OVERRIDE.split(":") if p]
    _missing = [p for p in _PARITY_DIRS if not os.path.isdir(p)]
    if _missing:
        raise RuntimeError(
            f"SPARK_GRAFT_PARITY_SF_DIRS names nonexistent dirs: {_missing}"
        )
else:
    _PARITY_DIRS = [
        p for p in _DEFAULT_PARITY.split(":") if os.path.isdir(p)
    ] or [_TEST_SF_DIR]


@pytest.fixture(
    scope="module", params=_PARITY_DIRS, ids=[os.path.basename(p) for p in _PARITY_DIRS]
)
def parity_sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def parity_duck(parity_sf_dir):
    import duckdb

    from cocktails_data_engineering_spark.sources.tables import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{parity_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison.

    NO int→float coercion (driver-strict): numerically equal Python
    values already compare/hash equal across int/float/Decimal, and the
    representation-level drift the driver's typed hash would catch is
    asserted separately via the Arrow type audit below."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _rows_to_multiset(rows, colnames):
    from collections import Counter

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), [colnames[i] for i in order]


def compare_query(spark, duck, sf_dir, name, fn, sql):
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    # Driver-strict TYPE check (the check that would have caught r4's
    # three red rows in round 1): the oracle result must contain no
    # column that cannot round-trip a pandas fetch losslessly (HUGEINT,
    # decimal precision > 18), and every column's type KIND must agree
    # with the Spark result's (int vs float vs decimal vs string ...).
    arrow_schema = duck.execute(sql).arrow().schema
    bad_types = audit_arrow_schema(arrow_schema)
    assert not bad_types, f"{name}: non-round-trippable oracle types: {bad_types}"
    kind_drift = kind_mismatches(sdf.schema, arrow_schema)
    assert not kind_drift, f"{name}: result-type kind drift: {kind_drift}"

    duck_res = duck.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()

    s_set, s_cols = _rows_to_multiset(spark_rows, spark_cols)
    d_set, d_cols = _rows_to_multiset(duck_rows, duck_cols)

    assert s_cols == d_cols, f"{name}: column names differ: spark={s_cols} duck={d_cols}"
    assert sum(s_set.values()) == sum(d_set.values()), (
        f"{name}: row count differs: spark={sum(s_set.values())} duck={sum(d_set.values())}"
    )
    if s_set != d_set:
        only_spark = list((s_set - d_set).items())[:3]
        only_duck = list((d_set - s_set).items())[:3]
        raise AssertionError(
            f"{name}: value mismatch; spark-only rows: {only_spark}; duck-only rows: {only_duck}"
        )


_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, parity_duck, parity_sf_dir, name):
    compare_query(
        spark, parity_duck, parity_sf_dir, name, _QUERIES[name], _ORACLES[name]
    )


def test_every_query_runs(spark, sf_dir):
    """Rows-only queries (no oracle) must at least execute and be stable."""
    for name, fn in _QUERIES.items():
        if name in _ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
