"""kNN lookup — engine addition mandated by BASELINE.json north_star
(no reference analog; SURVEY.md §2.3 "new surface").

Two paths:

* ``knn_bruteforce`` — exact: query-set × points cross join (query set
  broadcast — it is small by definition) + haversine + per-query top-k
  window.  The baseline and the oracle-checkable path.
* ``knn_tiled`` — scale path: candidates restricted to the query's tile
  k-ring (quadtree analog of an H3 k-ring) before the exact haversine
  re-rank.  Turns the O(Q×N) cross join into a partition-pruned join on
  tile_id: at 100 TB the points side is bucketed by tile, so the ring
  join touches only (2r+1)² tiles per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import sqlgen
from .assign import assign_tiles


def _ranked(joined: DataFrame, k: int) -> DataFrame:
    dist = F.expr(sqlgen.haversine_sql("q_lat", "q_lon", "p_lat", "p_lon"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist_km").asc(), F.col("point_id").asc())
    return (
        joined.withColumn("dist_km", F.round(dist, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "point_id", "dist_km")
    )


def knn_bruteforce(queries: DataFrame, points: DataFrame, k: int = 5) -> DataFrame:
    """queries(query_id, q_lon, q_lat) × points(point_id, p_lon, p_lat)
    → (query_id, rank, point_id, dist_km); deterministic ties by id."""
    return _ranked(F.broadcast(queries).crossJoin(points), k)


def knn_tiled(queries: DataFrame, points: DataFrame, zoom: int, ring: int = 1,
              k: int = 5) -> DataFrame:
    """Tile-ring candidate generation + exact re-rank.

    Each query expands to its (2·ring+1)² surrounding tiles (H3 k-ring
    analog on the slippy quadtree); points carry their base tile; the
    join hits only ring tiles.  With the points side bucketed/partitioned
    by tile this is a partition-pruned join, not a cross join.  Callers
    should pick ``zoom``/``ring`` so the ring is larger than the expected
    k-th-neighbour distance, or re-query at a coarser zoom on shortfall.
    """
    pt = assign_tiles(points, "point_id", "p_lon", "p_lat", zoom).select(
        F.col("element_id").alias("point_id"), "tile_x", "tile_y"
    ).join(points, "point_id")
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    qt = assign_tiles(queries, "query_id", "q_lon", "q_lat", zoom).select(
        F.col("element_id").alias("query_id"), "tile_x", "tile_y"
    ).join(queries, "query_id").withColumn(
        "ring", F.explode(F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets]))
    ).select(
        "query_id", "q_lon", "q_lat",
        (F.col("tile_x") + F.col("ring.dx")).alias("tile_x"),
        (F.col("tile_y") + F.col("ring.dy")).alias("tile_y"),
    )
    joined = F.broadcast(qt).join(pt, ["tile_x", "tile_y"]).select(
        "query_id", "q_lon", "q_lat", "point_id", "p_lon", "p_lat"
    ).dropDuplicates(["query_id", "point_id"])
    return _ranked(joined, k)
