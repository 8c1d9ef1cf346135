"""P7-P9 — polygon clip (point-in-polygon joins).

Reference: clipPoly (MapSplit.java:1073-1145) parses an Osmosis .poly
file into outer/inner rings and drops every modified tile whose 4
corners all fail the even-odd ray-casting test (isInside,
MapSplit.java:999-1065 — corner test only, approximate by design).

Spark-first: the polygon set is tiny (a country outline) → broadcast;
the tile set is the small side too (distinct tiles ≪ points).  The
ray-casting runs as a vectorized numpy kernel inside mapInPandas —
Arrow-batched, one O(corners × vertices) matrix op per batch — with a
bbox prefilter per ring (the STRtree-analog packed extent index; with
ring counts this small a full tree adds nothing).  Point-level exact
clip (``clip_points``) is the engine's extra precise mode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import tilemath as tm


def load_rings(polys_df: DataFrame, poly_id: str | None = None):
    """clip_polygons table → (outers, inners): lists of (n,2) numpy rings
    with precomputed bboxes.  Driver-side — the table is tiny (S4)."""
    rows = polys_df.filter(F.col("poly_id") == poly_id).collect() if poly_id \
        else polys_df.collect()
    outers, inners = [], []
    for r in rows:
        ring = np.array([(c["lon"], c["lat"]) for c in r.coords], dtype=np.float64)
        bbox = (ring[:, 0].min(), ring[:, 0].max(), ring[:, 1].min(), ring[:, 1].max())
        (inners if r.is_hole else outers).append((ring, bbox))
    return outers, inners


def _pip(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting (re-derivation of isInside,
    MapSplit.java:999-1010).  px/py (N,), ring (M,2) → bool (N,)."""
    xi, yi = ring[:, 0], ring[:, 1]
    xj, yj = np.roll(xi, 1), np.roll(yi, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        cond = (yi[None, :] > py[:, None]) != (yj[None, :] > py[:, None])
        xints = (xj - xi)[None, :] * (py[:, None] - yi[None, :]) / (yj - yi)[None, :] + xi[None, :]
        crossings = cond & (px[:, None] < xints)
    return (crossings.sum(axis=1) % 2).astype(bool)


def _in_any(px, py, rings) -> np.ndarray:
    hit = np.zeros(px.shape[0], dtype=bool)
    for ring, (x0, x1, y0, y1) in rings:
        cand = ~hit & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)  # bbox prefilter
        if cand.any():
            hit[cand] |= _pip(px[cand], py[cand], ring)
    return hit


def clip_tiles(tiles_df: DataFrame, outers, inners, zoom: int) -> DataFrame:
    """Corner-parity mode (P8): keep tiles where ≥1 of the 4 corners is
    inside an outer ring and not inside any inner ring
    (MapSplit.java:1020-1065 — corner-only, approximate by design)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            tx = pdf["tile_x"].to_numpy(np.float64)
            ty = pdf["tile_y"].to_numpy(np.float64)
            keep_in = np.zeros(len(pdf), dtype=bool)
            hole_hit = np.zeros(len(pdf), dtype=bool)
            for u in (0.0, 1.0):
                for v in (0.0, 1.0):
                    cx = tm.tile2lon(tx + u, zoom)
                    cy = tm.tile2lat(ty + v, zoom)
                    keep_in |= _in_any(cx, cy, outers)
                    if inners:
                        hole_hit |= _in_any(cx, cy, inners)
            yield pdf[keep_in & ~hole_hit]

    return tiles_df.mapInPandas(run, tiles_df.schema)


def clip_points(points_df: DataFrame, outers, inners,
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Exact point-level clip (engine precise mode): keep rows whose
    point is inside ≥1 outer ring and no inner ring."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            keep = _in_any(px, py, outers)
            if inners:
                keep &= ~_in_any(px, py, inners)
            yield pdf[keep]

    return points_df.mapInPandas(run, points_df.schema)


def clip_assignments(assignments: DataFrame, kept_tiles: DataFrame) -> DataFrame:
    """P9 — restrict the exploded assignment relation to surviving tiles
    (left-semi join ≡ the reference's bitset clear loop,
    MapSplit.java:1128-1145)."""
    return assignments.join(
        kept_tiles.select("tile_x", "tile_y").distinct(), ["tile_x", "tile_y"], "left_semi"
    )
