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

# bbox guard: the fill grid is ~1 byte/cell and the dilation sweep is
# O(cells × diameter) worst-case, so cap at 16M cells (4096×4096 tiles —
# a way spanning a third of the planet at z13; the reference BitSet has
# the same asymptotics, MapSplit.java:280-296).  Groups above the cap
# are SKIPPED and reported by fill_holes (never silently) — such
# near-planetary scattered "geometries" enclose nothing meaningful.
MAX_GRID_CELLS = 1 << 24


def _fill_one(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int]]:
    """Holes for one geometry's member tiles (the checkAndFill algorithm:
    pad-2 bbox, outside flood fill from (1,1) over a 4-neighbourhood
    restricted to rows/cols ≥ 1, unreached unmarked cells are holes).

    Frontier BFS on flat index arrays — O(cells) TOTAL like the
    reference's BitSet BFS (MapSplit.java:299-326); a whole-grid
    dilation sweep would be O(cells × diameter), minutes on the
    near-cap grids the bbox guard admits.
    """
    min_x, max_x = xs.min() - 2, xs.max() + 2
    min_y, max_y = ys.min() - 2, ys.max() + 2
    sx = int(max_x - min_x + 1)
    sy = int(max_y - min_y + 1)
    grid = np.zeros(sy * sx, dtype=bool)
    grid[(ys - min_y) * sx + (xs - min_x)] = True
    outside = np.zeros(sy * sx, dtype=bool)
    seed = 1 * sx + 1  # BFS starts at (1,1)
    frontier = np.empty(0, dtype=np.int64)
    if not grid[seed]:
        outside[seed] = True
        frontier = np.array([seed], dtype=np.int64)
    while frontier.size:
        col = frontier % sx
        row = frontier // sx
        # 4-neighbourhood, never into row/col 0 (reference :311-316)
        cand = np.concatenate([
            frontier[col > 1] - 1,
            frontier[col < sx - 1] + 1,
            frontier[row > 1] - sx,
            frontier[row < sy - 1] + sx,
        ])
        cand = np.unique(cand)
        cand = cand[~outside[cand] & ~grid[cand]]
        outside[cand] = True
        frontier = cand
    holes = ~grid & ~outside
    holes = holes.reshape(sy, sx)
    holes[0, :] = False
    holes[:, 0] = False
    hy, hx = np.where(holes)
    return [(int(x + min_x), int(y + min_y)) for x, y in zip(hx, hy)]


def fill_holes(group_tiles: DataFrame, group_col: str = "group_id",
               min_tiles: int = 8) -> DataFrame:
    """(group_id, tile_x, tile_y) → same relation + patched hole tiles.

    Small groups (< min_tiles, MapSplit.java:491-493) bypass the Python
    stage entirely via a pre-shuffle semi-join on a count aggregate.
    """
    src = group_tiles.select(
        F.col(group_col).alias("group_id"), "tile_x", "tile_y"
    )
    # one row per group — materialized once (localCheckpoint) so the
    # cap report and the semi-join below share the single agg pass
    stats = src.groupBy("group_id").agg(
        F.count("*").alias("n"),
        (F.max("tile_x") - F.min("tile_x") + 5).alias("sx"),
        (F.max("tile_y") - F.min("tile_y") + 5).alias("sy"),
    ).filter(F.col("n") >= min_tiles).localCheckpoint(eager=True)
    big = stats.filter(F.col("sx") * F.col("sy") <= MAX_GRID_CELLS).select("group_id")
    skipped = stats.filter(F.col("sx") * F.col("sy") > MAX_GRID_CELLS)
    n_skipped = skipped.count()
    if n_skipped:
        # never silent: the reference fills every ≥8-tile way; we refuse
        # only near-planetary scattered groups (grid > MAX_GRID_CELLS)
        import logging

        logging.getLogger(__name__).warning(
            "fill_holes: skipped %d group(s) with bbox grid > %d cells: %s",
            n_skipped, MAX_GRID_CELLS,
            [r.group_id for r in skipped.select("group_id").limit(10).collect()],
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

    gid_type = dict(src.dtypes)["group_id"]  # schema follows the caller's key type
    holes = candidates.groupBy("group_id").applyInPandas(
        patch, f"group_id {gid_type}, tile_x long, tile_y long"
    )
    out = src.unionByName(holes).dropDuplicates(["group_id", "tile_x", "tile_y"])
    return out.withColumnRenamed("group_id", group_col)
