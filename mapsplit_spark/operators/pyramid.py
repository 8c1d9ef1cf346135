"""Tile pyramid rollup (engine addition, r4) — per-level aggregates
from the base assignment up to a coarser min zoom.

Slippy-map consumers (raster pyramids, heat maps, zoom-dependent
styling) need the A2 per-tile histogram at EVERY zoom level, not just
the base: an element occupying base tile (x, y) occupies ancestor
(x >> d, y >> d) at zoom − d (quadtree nesting — the same shift
identity knn's ``_coarsen_tiles`` and the §2.5 merge rely on).

Spark-first shape — ONE pass, TWO shuffles, independent of pyramid
depth: the exploded (element, tile) relation fans out its D ancestor
rows MAP-SIDE (a generate, no shuffle), one dropDuplicates collapses
the multi-child convergence (an element in several level-z children of
one parent counts ONCE at the parent — the semantics that make the
rollup a DISTINCT count, matching the engine's distinct (element,
tile) pair model, SURVEY.md §2.7), and one partially-aggregated
groupBy produces every level's histogram.  The alternative — D
successive parent-distinct passes — shuffles D times and serializes
levels; at 100 TB the fan-out factor D (≤ ~8 useful levels) is cheap
against D extra exchanges.

``pyramid_counts`` → (zoom, tile_x, tile_y, n) for zoom in
[min_zoom, base_zoom]; level base_zoom equals ``tile_counts`` over the
distinct pair relation by construction (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pyramid_counts(assignments: DataFrame, base_zoom: int, min_zoom: int,
                   id_col: str = "element_id",
                   assume_distinct: bool = False) -> DataFrame:
    """(element_id, tile_x, tile_y) at ``base_zoom`` →
    (zoom, tile_x, tile_y, n) for every level in [min_zoom, base_zoom];
    ``n`` counts DISTINCT elements per tile at that level.

    ``assume_distinct`` skips the base-pair dedupe when the input is
    already distinct (the assign→expand output) — the ancestor-level
    dedupe always runs (it is what collapses multi-child convergence).
    """
    if min_zoom > base_zoom or min_zoom < 0:
        raise ValueError(f"need 0 ≤ min_zoom ≤ base_zoom, got {min_zoom}/{base_zoom}")
    src = assignments if assume_distinct else \
        assignments.dropDuplicates([id_col, "tile_x", "tile_y"])
    depth = base_zoom - min_zoom
    levels = F.explode(F.array(*[
        F.struct(
            F.lit(base_zoom - d).alias("zoom"),
            F.shiftright("tile_x", d).alias("tile_x"),
            F.shiftright("tile_y", d).alias("tile_y"),
        )
        for d in range(depth + 1)
    ])).alias("lv")
    return (
        src.select(F.col(id_col), levels)
        .select(id_col, "lv.zoom", "lv.tile_x", "lv.tile_y")
        .dropDuplicates([id_col, "zoom", "tile_x", "tile_y"])
        .groupBy("zoom", "tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
    )
