"""§2.6 — flood-fill hole patching for multi-tile geometries.

Reference: checkAndFill (MapSplit.java:253-352) — a closed ring of ≥ 8
tiles can enclose tiles containing none of its points; those "holes"
must be added to the geometry's tile set (pad bbox by 2, flood-fill the
outside from (1,1) with a 4-neighbourhood, unreached cells are holes).
Trigger: tile-set size ≥ 8 (MapSplit.java:491-493).

Spark-first: this is inherently per-group imperative logic, so it is the
one place we drop to ``applyInPandas`` — Arrow-batched, embarrassingly
parallel, keyed by group id; the only shuffle is the groupBy.  Groups
below the ≥ 8-tile trigger are filtered out BEFORE the shuffle (a
map-side count aggregation), so at 100 TB the expensive path sees only
the tiny fraction of large geometries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "group_id string, tile_x long, tile_y long"


def _fill_one(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int]]:
    """Holes for one geometry's member tiles (oracle.hole_fill algorithm:
    pad-2 bbox, outside flood fill from (1,1), 4-neighbourhood)."""
    min_x, max_x = xs.min() - 2, xs.max() + 2
    min_y, max_y = ys.min() - 2, ys.max() + 2
    sx = int(max_x - min_x + 1)
    sy = int(max_y - min_y + 1)
    grid = np.zeros((sy, sx), dtype=bool)
    grid[ys - min_y, xs - min_x] = True
    seen = np.zeros_like(grid)
    stack = [(1, 1)]
    while stack:
        gx, gy = stack.pop()
        if gx < 1 or gy < 1 or gx >= sx or gy >= sy:
            continue
        if seen[gy, gx] or grid[gy, gx]:
            seen[gy, gx] = True
            continue
        seen[gy, gx] = True
        stack.extend([(gx + 1, gy), (gx - 1, gy), (gx, gy + 1), (gx, gy - 1)])
    hy, hx = np.where(~grid & ~seen)
    keep = (hx >= 1) & (hy >= 1)
    return [(int(x + min_x), int(y + min_y)) for x, y in zip(hx[keep], hy[keep])]


def fill_holes(group_tiles: DataFrame, group_col: str = "group_id",
               min_tiles: int = 8) -> DataFrame:
    """(group_id, tile_x, tile_y) → same relation + patched hole tiles.

    Small groups (< min_tiles, MapSplit.java:491-493) bypass the Python
    stage entirely via a pre-shuffle semi-join on a count aggregate.
    """
    src = group_tiles.select(
        F.col(group_col).alias("group_id"), "tile_x", "tile_y"
    )
    big = (
        src.groupBy("group_id").count()
        .filter(F.col("count") >= min_tiles)
        .select("group_id")
    )
    candidates = src.join(big, "group_id")  # AQE picks broadcast when small

    def patch(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["tile_x"].to_numpy(dtype=np.int64)
        ys = pdf["tile_y"].to_numpy(dtype=np.int64)
        holes = _fill_one(xs, ys)
        if not holes:
            return pdf.iloc[0:0]
        gid = pdf["group_id"].iloc[0]
        return pd.DataFrame(
            {"group_id": gid, "tile_x": [h[0] for h in holes], "tile_y": [h[1] for h in holes]}
        )

    holes = candidates.groupBy("group_id").applyInPandas(patch, _OUT_SCHEMA)
    out = src.unionByName(holes).dropDuplicates(["group_id", "tile_x", "tile_y"])
    return out.withColumnRenamed("group_id", group_col)
