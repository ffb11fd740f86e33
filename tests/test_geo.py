"""Semantic checks for the geo bucketing family: the bucketed nearest
neighbor must equal the brute-force nearest whenever the true nearest
lies within the 3x3 cell neighborhood (which it does for the fixture's
densities); density cells must tile the box."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from cocktails_data_engineering_spark.operators.geo import (
    CELL,
    COS_LAT0,
    _points,
    geo_cell_density,
    geo_nearest_supplier,
)
from cocktails_data_engineering_spark.sources.tables import load


def test_geo_nearest_matches_bruteforce_within_ring(spark, sf_dir):
    got = {
        r.cust_id: (r.supp_id, r.d)
        for r in geo_nearest_supplier(spark, sf_dir).collect()
    }
    cust = {
        r.c_id: (r.c_lat, r.c_lon, r.c_cx, r.c_cy)
        for r in _points(load(spark, sf_dir, "customer"), "c_custkey", "c").collect()
    }
    supp = {
        r.s_id: (r.s_lat, r.s_lon, r.s_cx, r.s_cy)
        for r in _points(load(spark, sf_dir, "supplier"), "s_suppkey", "s").collect()
    }
    assert got
    for cid, (sid, d) in list(got.items())[:200]:
        clat, clon, cx, cy = cust[cid]
        # brute-force nearest among suppliers in the 3x3 ring
        best = None
        for s_id, (slat, slon, sx, sy) in supp.items():
            if abs(sx - cx) <= 1 and abs(sy - cy) <= 1:
                dist = round(
                    math.sqrt(((clon - slon) * COS_LAT0) ** 2 + (clat - slat) ** 2), 6
                )
                key = (dist, s_id)
                if best is None or key < best:
                    best = key
        assert best is not None and best == (d, sid), cid


def test_geo_density_counts_sum_to_customers(spark, sf_dir):
    rows = geo_cell_density(spark, sf_dir).collect()
    assert rows and all(r.n_customers > 0 for r in rows)
    ns = [r.n_customers for r in rows]
    assert ns == sorted(ns, reverse=True)
    # cells are within the ~1 degree box
    for r in rows:
        assert 40.0 / CELL - 1 <= r.cell_x <= 41.0 / CELL + 1
        assert -74.5 / CELL - 1 <= r.cell_y <= -73.5 / CELL + 1
