"""§2.5 — hierarchical tile merge ("optimize" pass, -O nodeLimit).

Reference: optimize()/getCounts/mapToNewTile (MapSplit.java:858-989) —
base-zoom tiles with fewer than nodeLimit elements are merged into
coarser-zoom parents: walking zoom-out levels d = 1..4
(MAX_ZOOM_OUT_DIFF = 5), accept the first 2^d×2^d sibling block whose
total lands in (nodeLimit, 4·nodeLimit) — or the deepest level tried —
backing off one level when the total reaches ≥ 4·nodeLimit.  Iteration
is over tiles in ascending packed-key order and already-merged tiles
are skipped, which makes the pass order-dependent and inherently
sequential — exactly how the reference runs it.

Spark split of responsibilities (SURVEY.md §4): the per-tile histogram
(A2) is a distributed groupBy; the sequential merge walks the COLLECTED
histogram on the driver (same memory profile as the reference's stats
map — bounded by distinct modified tiles, ~10^7 entries at planet
scale ≈ 100 MB); the resulting tile→zoom map broadcasts back into a
join.  Re-keyed duplicates are removed per element, matching the
optimized store path's HashSet dedupe (MapSplit.java:1304-1320).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ZOOM_OUT_DIFF = 5  # MapSplit.java:80


def compute_zoom_map(counts: dict[tuple[int, int], int], zoom: int,
                     node_limit: int) -> dict[tuple[int, int], int]:
    """counts: {(x, y): n} at base zoom → {(x, y): new_zoom} for merged
    tiles.  Pure-Python mirror of MapSplit.java:858-936; also used by
    the pytest oracle."""
    if node_limit <= 0:
        return {}
    zoom_map: dict[tuple[int, int], int] = {}
    for key in sorted(counts, key=lambda t: (t[0] << 16) | t[1]):
        if key in zoom_map or counts[key] >= node_limit:
            continue
        prev_block = None
        prev_zoom = None
        for d in range(1, MAX_ZOOM_OUT_DIFF):
            new_zoom = zoom - d
            x0 = (key[0] >> d) << d
            y0 = (key[1] >> d) << d
            side = 1 << d
            block = [
                (x0 + i, y0 + j)
                for i in range(side) for j in range(side)
                if (x0 + i, y0 + j) in counts
            ]
            total = sum(counts[t] for t in block)
            if total < 4 * node_limit:
                if total > node_limit or d == MAX_ZOOM_OUT_DIFF - 1:
                    for t in block:
                        zoom_map[t] = new_zoom
                    break
                prev_block, prev_zoom = block, new_zoom
            else:
                if prev_block is not None:
                    for t in prev_block:
                        zoom_map[t] = prev_zoom + 1 if prev_zoom is not None else zoom
                break
    return zoom_map


def merged_assignments(assignments: DataFrame, zoom: int, node_limit: int,
                       counts: DataFrame | None = None) -> DataFrame:
    """Re-key exploded (element_id, tile_x, tile_y) through the merge map.

    → (element_id, zoom, tile_x, tile_y) distinct — merged tiles carry
    their coarser zoom and right-shifted coordinates
    (mapToNewTile, MapSplit.java:985-989).
    """
    spark = assignments.sparkSession
    if counts is None:
        counts = assignments.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n"))
    stats = {(r.tile_x, r.tile_y): r.n for r in counts.collect()}
    zmap = compute_zoom_map(stats, zoom, node_limit)
    if not zmap:
        return assignments.select(
            "element_id", F.lit(zoom).alias("zoom"), "tile_x", "tile_y"
        ).dropDuplicates(["element_id", "tile_x", "tile_y"])
    zmap_df = F.broadcast(spark.createDataFrame(
        [(x, y, z) for (x, y), z in zmap.items()], "mx long, my long, new_zoom int"
    ))
    joined = assignments.join(
        zmap_df,
        (assignments.tile_x == zmap_df.mx) & (assignments.tile_y == zmap_df.my),
        "left",
    )
    shift = F.lit(zoom) - F.col("new_zoom")
    return (
        joined.select(
            "element_id",
            F.coalesce(F.col("new_zoom"), F.lit(zoom)).alias("zoom"),
            F.when(
                F.col("new_zoom").isNotNull(),
                (F.col("tile_x") / F.pow(F.lit(2.0), shift)).cast("long"),
            ).otherwise(F.col("tile_x")).alias("tile_x_new"),
            F.when(
                F.col("new_zoom").isNotNull(),
                (F.col("tile_y") / F.pow(F.lit(2.0), shift)).cast("long"),
            ).otherwise(F.col("tile_y")).alias("tile_y_new"),
        )
        .select(
            "element_id", "zoom",
            F.col("tile_x_new").alias("tile_x"),
            F.col("tile_y_new").alias("tile_y"),
        )
        .dropDuplicates(["element_id", "zoom", "tile_x", "tile_y"])
    )
