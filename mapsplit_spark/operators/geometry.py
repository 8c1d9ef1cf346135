"""Per-way geometry statistics: great-circle length, bbox, centroid.

Engine addition on the mapsplit data model: the reference stores ways
as ordered node lists and computes only their tile memberships
(MapSplit.java way pass); a geospatial analytics engine also needs the
derived geometry — polyline length (haversine over consecutive
vertices), bounding box, and vertex centroid per way — e.g. to filter
degenerate traces, weight sampling by trace length, or size tile
render budgets.

Spark-first shape: ONE shuffle.  The vertex successor comes from a
``lead()`` window over (way, seq); the per-way aggregate groups on the
window's own partition key, so Catalyst reuses the exchange (pinned in
tests/test_geometry.py).  No Python anywhere.

Float determinism: every accumulated quantity is quantized to an exact
integer first — edge lengths to millimetres, coordinates to
microdegrees (sqlgen.mm_from_km_sql / udeg_sql, shared verbatim with
the DuckDB oracle) — so sums and means are order-independent and the
gate is value-exact despite double inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import sqlgen


def polyline_stats(nodes: DataFrame, way_col: str, seq_col: str,
                   lon_col: str, lat_col: str) -> DataFrame:
    """→ one row per way: (way_col, n_pts, length_mm, min_lon_u,
    max_lon_u, min_lat_u, max_lat_u, c_lon_u, c_lat_u).

    ``length_mm`` = Σ haversine(v_i, v_i+1) in integer millimetres;
    ``*_u`` columns are exact microdegrees; the centroid is the
    integer-rounded vertex mean (unweighted, matching the reference's
    node-set semantics rather than arc-length weighting)."""
    w = Window.partitionBy(way_col).orderBy("_seq")
    hav = sqlgen.haversine_sql("_lat", "_lon", "_nlat", "_nlon")
    stepped = nodes.select(
        F.col(way_col),
        F.col(seq_col).alias("_seq"),
        F.expr(lon_col).cast("double").alias("_lon"),
        F.expr(lat_col).cast("double").alias("_lat"),
    ).withColumns({
        "_nlon": F.lead("_lon").over(w),
        "_nlat": F.lead("_lat").over(w),
    }).withColumns({
        "_edge_mm": F.when(
            F.col("_nlon").isNotNull(),
            F.expr(sqlgen.mm_from_km_sql(hav)),
        ),
        "_lon_u": F.expr(sqlgen.udeg_sql("_lon")),
        "_lat_u": F.expr(sqlgen.udeg_sql("_lat")),
    })
    return stepped.groupBy(way_col).agg(
        F.count("*").cast("long").alias("n_pts"),
        F.coalesce(F.sum("_edge_mm"), F.lit(0)).cast("long").alias("length_mm"),
        F.min("_lon_u").alias("min_lon_u"),
        F.max("_lon_u").alias("max_lon_u"),
        F.min("_lat_u").alias("min_lat_u"),
        F.max("_lat_u").alias("max_lat_u"),
        F.expr("CAST(ROUND(CAST(SUM(_lon_u) AS DOUBLE) / COUNT(*), 0) AS BIGINT)")
        .alias("c_lon_u"),
        F.expr("CAST(ROUND(CAST(SUM(_lat_u) AS DOUBLE) / COUNT(*), 0) AS BIGINT)")
        .alias("c_lat_u"),
    )


def polyline_stats_sql(src: str, way_col: str, seq_col: str,
                       lon_col: str, lat_col: str) -> str:
    """The SAME computation as declarative SQL (lead() + one GROUP BY),
    generated once for the DuckDB oracle — quantization/haversine
    formula text shared with the Spark operator, relational plan
    independent."""
    hav = sqlgen.haversine_sql("_lat", "_lon", "_nlat", "_nlon")
    return f"""
WITH v AS (
  SELECT {way_col},
         CAST({lon_col} AS DOUBLE) AS _lon, CAST({lat_col} AS DOUBLE) AS _lat,
         LEAD(CAST({lon_col} AS DOUBLE)) OVER
           (PARTITION BY {way_col} ORDER BY {seq_col}) AS _nlon,
         LEAD(CAST({lat_col} AS DOUBLE)) OVER
           (PARTITION BY {way_col} ORDER BY {seq_col}) AS _nlat
  FROM {src}
),
e AS (
  SELECT {way_col}, _lon, _lat,
         CASE WHEN _nlon IS NOT NULL
              THEN {sqlgen.mm_from_km_sql(hav)} END AS _edge_mm,
         {sqlgen.udeg_sql('_lon')} AS _lon_u,
         {sqlgen.udeg_sql('_lat')} AS _lat_u
  FROM v
)
SELECT {way_col},
       CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(COALESCE(SUM(_edge_mm), 0) AS BIGINT) AS length_mm,
       MIN(_lon_u) AS min_lon_u, MAX(_lon_u) AS max_lon_u,
       MIN(_lat_u) AS min_lat_u, MAX(_lat_u) AS max_lat_u,
       CAST(ROUND(CAST(SUM(_lon_u) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS c_lon_u,
       CAST(ROUND(CAST(SUM(_lat_u) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS c_lat_u
FROM e GROUP BY {way_col}
"""
