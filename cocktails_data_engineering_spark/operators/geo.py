"""Geo-spatial bucketing operators (grid-cell candidates → exact verify).

The reference plans a "Django + PostGIS web app" over its crawl warehouse
(``/root/reference/README.md:2``) — the geo layer it defers.  These
operators provide the two queries such an app needs at warehouse scale:
nearest-facility assignment and spatial density — expressed Spark-first
with the same candidates→verify discipline as the LSH families: a grid
CELL is the spatial band; candidate pairs come from an equi-join on cell
ids (probe side exploded over the 3×3 neighborhood); the exact distance
runs on candidates only.  Never a cross join of points.

Coordinates are deterministic md5-derived synthetic positions in a ~1°
box (the fixture has no geo columns), and the distance is the planar
equirectangular approximation with a FIXED cos(lat₀) literal — pure
arithmetic (no trig at query time), so both engines agree bit-for-bit.
A real deployment swaps in haversine + real coordinates; the plan shape
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load, load_spread

LAT0, LON0 = 40.0, -74.5  # box origin (NYC-ish)
COS_LAT0 = 0.766  # fixed literal: cos(40°) ≈ 0.766, rounded spec constant (LAT0 = 40.0)
CELL = 0.05  # grid cell size in degrees (the spatial band width)
GEO_TOP = 20

_SQL_H = "CAST(('0x' || substr(md5({key}), {off}, 8)) AS BIGINT) % 10000"


def _sql_latlon(key: str) -> tuple[str, str]:
    lat = f"({LAT0} + ({_SQL_H.format(key=key, off=1)}) / 10000.0)"
    lon = f"({LON0} + ({_SQL_H.format(key=key, off=9)}) / 10000.0)"
    return lat, lon


def _col_latlon(key):
    h1 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 10000
    h2 = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long") % 10000
    return LAT0 + h1 / 10000.0, LON0 + h2 / 10000.0


def _points(df: DataFrame, key_col: str, prefix: str) -> DataFrame:
    lat, lon = _col_latlon(F.col(key_col).cast("string"))
    return df.select(
        F.col(key_col).alias(f"{prefix}_id"),
        lat.alias(f"{prefix}_lat"),
        lon.alias(f"{prefix}_lon"),
        F.floor(lat / CELL).cast("long").alias(f"{prefix}_cx"),
        F.floor(lon / CELL).cast("long").alias(f"{prefix}_cy"),
    )


_NEIGH = (
    "(SELECT unnest(range(-1, 2)) AS dx) nx, "
    "(SELECT unnest(range(-1, 2)) AS dy) ny"
)


@register(
    "geo_nearest_supplier",
    oracle=f"""
WITH c AS (
  SELECT c_custkey AS cust_id,
         {_sql_latlon("CAST(c_custkey AS VARCHAR)")[0]} AS clat,
         {_sql_latlon("CAST(c_custkey AS VARCHAR)")[1]} AS clon
  FROM customer
),
s AS (
  SELECT s_suppkey AS supp_id,
         {_sql_latlon("CAST(s_suppkey AS VARCHAR)")[0]} AS slat,
         {_sql_latlon("CAST(s_suppkey AS VARCHAR)")[1]} AS slon
  FROM supplier
),
cc AS (
  SELECT *, CAST(floor(clat / {CELL}) AS BIGINT) AS cx,
            CAST(floor(clon / {CELL}) AS BIGINT) AS cy FROM c
),
sc AS (
  SELECT *, CAST(floor(slat / {CELL}) AS BIGINT) AS cx,
            CAST(floor(slon / {CELL}) AS BIGINT) AS cy FROM s
),
probe AS (
  SELECT cc.*, cc.cx + g.dx AS px, cc.cy + g.dy AS py
  FROM cc CROSS JOIN (SELECT nx.dx, ny.dy FROM {_NEIGH}) g
),
cand AS (
  SELECT p.cust_id, sc.supp_id,
         ROUND(sqrt(((p.clon - sc.slon) * {COS_LAT0}) * ((p.clon - sc.slon) * {COS_LAT0})
                    + (p.clat - sc.slat) * (p.clat - sc.slat)), 6) AS d
  FROM probe p JOIN sc ON sc.cx = p.px AND sc.cy = p.py
),
ranked AS (
  SELECT cust_id, supp_id, d,
         ROW_NUMBER() OVER (PARTITION BY cust_id ORDER BY d, supp_id) AS rk
  FROM cand
)
SELECT cust_id, supp_id, d FROM ranked WHERE rk = 1
""",
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-supplier assignment via grid-cell bucketing: each
    customer probes the 3×3 cell neighborhood around its own cell, the
    exact (planar) distance runs on those candidates only, and the
    argmin is a per-customer windowed rank — the PostGIS
    ``ST_DWithin + ORDER BY distance LIMIT 1`` query, Spark-first.
    Customers with an empty neighborhood (no supplier within one cell
    ring) are excluded deterministically on both engines.

    Plan at 100 TB: the cell id is the spatial band — candidates come
    from an equi-join on (cell_x, cell_y) after a 9× probe-side explode
    (bounded fan-out), never a cross join of the point sets; density
    skew in a hot cell is AQE's skew-split case.  Same
    candidates→verify shape as the LSH families."""
    cust = _points(load_spread(spark, sf_dir, "customer"), "c_custkey", "c")
    supp = _points(load(spark, sf_dir, "supplier"), "s_suppkey", "s")
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    neigh = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in offsets
            ]
        )
    ).alias("g")
    probe = cust.select("*", neigh).select(
        "*",
        (F.col("c_cx") + F.col("g.dx")).alias("px"),
        (F.col("c_cy") + F.col("g.dy")).alias("py"),
    )
    dlon = (F.col("c_lon") - F.col("s_lon")) * COS_LAT0
    dlat = F.col("c_lat") - F.col("s_lat")
    cand = probe.join(
        supp,
        (F.col("s_cx") == F.col("px")) & (F.col("s_cy") == F.col("py")),
    ).select(
        F.col("c_id").alias("cust_id"),
        F.col("s_id").alias("supp_id"),
        F.round(F.sqrt(dlon * dlon + dlat * dlat), 6).alias("d"),
    )
    w = Window.partitionBy("cust_id").orderBy("d", "supp_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cust_id", "supp_id", "d")
    )


@register(
    "geo_cell_density",
    oracle=f"""
WITH c AS (
  SELECT {_sql_latlon("CAST(c_custkey AS VARCHAR)")[0]} AS clat,
         {_sql_latlon("CAST(c_custkey AS VARCHAR)")[1]} AS clon
  FROM customer
)
SELECT CAST(floor(clat / {CELL}) AS BIGINT) AS cell_x,
       CAST(floor(clon / {CELL}) AS BIGINT) AS cell_y,
       COUNT(*) AS n_customers
FROM c
GROUP BY cell_x, cell_y
ORDER BY n_customers DESC, cell_x, cell_y
LIMIT {GEO_TOP}
""",
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density: customer count per grid cell, top-{GEO_TOP}
    densest cells — the heatmap / hot-zone query (PostGIS
    ``ST_SnapToGrid + count``).  Map-side cell assignment, one
    aggregate, TakeOrderedAndProject."""
    cust = _points(load_spread(spark, sf_dir, "customer"), "c_custkey", "c")
    return (
        cust.groupBy(
            F.col("c_cx").alias("cell_x"), F.col("c_cy").alias("cell_y")
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), "cell_x", "cell_y")
        .limit(GEO_TOP)
    )
