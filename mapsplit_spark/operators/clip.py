"""P7-P9 — polygon clip (point-in-polygon joins).

Reference: clipPoly (MapSplit.java:1073-1145) parses an Osmosis .poly
file into outer/inner rings and drops every modified tile whose 4
corners all fail the even-odd ray-casting test (isInside,
MapSplit.java:999-1065 — corner test only, approximate by design).

Spark-first: the polygon set is tiny (a country outline) → broadcast;
the tile set is the small side too (distinct tiles ≪ points).  The
ray-casting runs as a vectorized numpy kernel inside mapInPandas —
Arrow-batched, one O(corners × vertices) matrix op per batch — with a
bbox prefilter per ring.  Point-level exact clip (``clip_points``) is
the engine's extra precise mode.

At web scale the ring side grows to thousands of admin/tile-boundary
polygons; from ``STRTREE_MIN_RINGS`` rings (the measured linear/tree
crossover) both clip operators switch (``use_index="auto"``) to the
packed STR R-tree (``strtree.py``):
candidates come from a vectorized whole-batch tree descent instead of
R per-ring bbox passes, then the SAME ``_pip`` kernel refines — bit-
identical results, differential-tested, oracle gate ``clip_strtree``.
``broadcast_polygon_index`` ships rings + trees once per executor as
an explicit Spark broadcast (the closures here serialize per task —
fine for one country outline, wasteful for 10^4 rings).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import tilemath as tm
from ..strtree import build_strtree, query_strtree

# measured crossover (tools/bench_strtree.py, ~1x-coverage rings,
# 100 k-pt batches): the linear scan's streaming passes beat the tree's
# gather-heavy descent below ~1000 rings; the tree wins 3x at 2000,
# ~10x at 5000, ~80x at 50 000.  "auto" switches just under the
# crossover; pass use_index=True to force the tree at any count.
STRTREE_MIN_RINGS = 768


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


def _flatten_rings(rings):
    """Concatenate ring vertices into flat arrays (vx, vy, off, lens)
    so the pair-batched PIP can gather edges with pure index math."""
    vx = np.ascontiguousarray(np.concatenate([r[:, 0] for r, _ in rings]))
    vy = np.ascontiguousarray(np.concatenate([r[:, 1] for r, _ in rings]))
    lens = np.array([r.shape[0] for r, _ in rings], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    return vx, vy, off, lens


def _in_any_indexed(px, py, flat, tree) -> np.ndarray:
    """Same membership OR as ``_in_any`` but candidates come from one
    vectorized STR-tree descent (O(hits) pairs) instead of R bbox
    passes, and the even-odd refine runs ONE batched pass over all
    (pair, edge) tuples — no per-ring Python loop.  The crossing
    formula is ``_pip``'s verbatim, so parities (and therefore the
    result) are bit-equal to the linear scan."""
    hit = np.zeros(px.shape[0], dtype=bool)
    p_in, _ = _pairs_indexed(px, py, flat, tree)
    hit[p_in] = True
    return hit


def _pairs_indexed(px, py, flat, tree):
    """(point_idx, ring_idx) pairs with the point INSIDE the ring —
    the per-zone variant of ``_in_any_indexed`` (same descent, same
    batched even-odd refine, no OR-collapse)."""
    empty = np.zeros(0, dtype=np.int64)
    p_idx, r_idx = query_strtree(tree, px, py)
    if p_idx.size == 0:
        return empty, empty
    vx, vy, off, lens = flat
    counts = lens[r_idx]
    total = int(counts.sum())
    starts = np.cumsum(counts) - counts
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    lens_e = np.repeat(lens[r_idx], counts)
    base = np.repeat(off[r_idx], counts)
    vi = base + j
    vprev = base + (j - 1) % lens_e       # np.roll(·, 1) pairing
    ep = np.repeat(p_idx, counts)
    X, Y = px[ep], py[ep]
    xi, yi = vx[vi], vy[vi]
    xj, yj = vx[vprev], vy[vprev]
    with np.errstate(divide="ignore", invalid="ignore"):
        cond = (yi > Y) != (yj > Y)
        xints = (xj - xi) * (Y - yi) / (yj - yi) + xi
        cross = cond & (X < xints)
    per_pair = np.add.reduceat(cross.astype(np.int64), starts) \
        if starts.size else np.zeros(0, dtype=np.int64)
    inside = (per_pair % 2).astype(bool)
    return p_idx[inside], r_idx[inside]


def _pairs_linear(px, py, rings):
    """(point_idx, ring_idx) inside-pairs by per-ring scan (no
    first-match short-circuit — every containing ring reports)."""
    ps, rs = [], []
    for ri, (ring, (x0, x1, y0, y1)) in enumerate(rings):
        cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
        if cand.any():
            idx = np.nonzero(cand)[0]
            ok = _pip(px[idx], py[idx], ring)
            ps.append(idx[ok])
            rs.append(np.full(int(ok.sum()), ri, dtype=np.int64))
    if not ps:
        e = np.zeros(0, dtype=np.int64)
        return e, e
    return np.concatenate(ps), np.concatenate(rs)


def _membership_fn(rings, use_index):
    """Pick linear scan vs STR-tree for a ring set; both compute the
    identical even-odd membership OR."""
    if rings and (use_index is True or
                  (use_index == "auto" and len(rings) >= STRTREE_MIN_RINGS)):
        tree = build_strtree(np.array([b for _, b in rings]))
        flat = _flatten_rings(rings)
        return lambda px, py: _in_any_indexed(px, py, flat, tree)
    return lambda px, py: _in_any(px, py, rings)


def clip_tiles(tiles_df: DataFrame, outers, inners, zoom: int,
               use_index: bool | str = "auto") -> DataFrame:
    """Corner-parity mode (P8): keep tiles where ≥1 of the 4 corners is
    inside an outer ring and not inside any inner ring
    (MapSplit.java:1020-1065 — corner-only, approximate by design)."""
    in_outer = _membership_fn(outers, use_index)
    in_inner = _membership_fn(inners, use_index)

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
                    keep_in |= in_outer(cx, cy)
                    if inners:
                        hole_hit |= in_inner(cx, cy)
            yield pdf[keep_in & ~hole_hit]

    return tiles_df.mapInPandas(run, tiles_df.schema)


def clip_points(points_df: DataFrame, outers, inners,
                lon_col: str = "lon", lat_col: str = "lat",
                use_index: bool | str = "auto") -> DataFrame:
    """Exact point-level clip (engine precise mode): keep rows whose
    point is inside ≥1 outer ring and no inner ring."""
    in_outer = _membership_fn(outers, use_index)
    in_inner = _membership_fn(inners, use_index)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            keep = in_outer(px, py)
            if inners:
                keep &= ~in_inner(px, py)
            yield pdf[keep]

    return points_df.mapInPandas(run, points_df.schema)


def zone_assign(points_df: DataFrame, outers, inners,
                id_col: str = "element_id",
                lon_col: str = "lon", lat_col: str = "lat",
                use_index: bool | str = "auto") -> DataFrame:
    """Zonal assignment — the per-zone refinement of ``clip_points``:
    → (id_col, zone) with ``zone`` = 0-based index of each OUTER ring
    containing the point (one row per containing ring, so overlapping
    zones each count the point); points inside any inner (hole) ring
    are dropped entirely, matching the clip semantics.

    Zonal statistics (the raster-algebra zonal sum/count over vector
    zones) are then one plain groupBy("zone") away — partial-aggregated
    JVM-side, so the Python stage only emits (id, zone) pairs.  Same
    broadcast/index story as clip_points: the ring set + STR tree ship
    once per executor; candidates per point are bounded by ring
    overlap, not ring count."""
    if use_index is True or (use_index == "auto"
                             and len(outers) >= STRTREE_MIN_RINGS):
        tree = build_strtree(np.array([b for _, b in outers]))
        flat = _flatten_rings(outers)
        pairs_fn = lambda px, py: _pairs_indexed(px, py, flat, tree)  # noqa: E731
    else:
        pairs_fn = lambda px, py: _pairs_linear(px, py, outers)  # noqa: E731
    in_inner = _membership_fn(inners, use_index)
    id_type = dict(points_df.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            p_idx, r_idx = pairs_fn(px, py)
            if inners and p_idx.size:
                keep = ~in_inner(px, py)[p_idx]
                p_idx, r_idx = p_idx[keep], r_idx[keep]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[p_idx],
                "zone": r_idx.astype(np.int32),
            })

    return points_df.select(id_col, lon_col, lat_col).mapInPandas(
        run, f"{id_col} {id_type}, zone int")


def broadcast_polygon_index(spark, outers, inners, use_index: bool | str = True):
    """Build the STR trees once driver-side and ship (rings, trees) to
    every executor as an explicit Spark broadcast — one transfer per
    executor instead of one closure copy per task.  Use with
    ``clip_points_bc`` when the ring set is large (10^3-10^5 admin /
    tile-boundary polygons — the north-star PIP-join shape)."""
    def pack(rings):
        if rings and (use_index is True or
                      (use_index == "auto" and len(rings) >= STRTREE_MIN_RINGS)):
            return rings, (_flatten_rings(rings),
                           build_strtree(np.array([b for _, b in rings])))
        return rings, None
    return spark.sparkContext.broadcast((pack(outers), pack(inners)))


def clip_points_bc(points_df: DataFrame, bc,
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """``clip_points`` over a ``broadcast_polygon_index`` handle — the
    Arrow batches never see the rings until ``bc.value`` resolves on
    the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        (outers, t_out), (inners, t_in) = bc.value
        in_outer = (lambda px, py: _in_any_indexed(px, py, t_out[0], t_out[1])) \
            if t_out is not None else (lambda px, py: _in_any(px, py, outers))
        in_inner = (lambda px, py: _in_any_indexed(px, py, t_in[0], t_in[1])) \
            if t_in is not None else (lambda px, py: _in_any(px, py, inners))
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            keep = in_outer(px, py)
            if inners:
                keep &= ~in_inner(px, py)
            yield pdf[keep]

    return points_df.mapInPandas(run, points_df.schema)


def clip_assignments(assignments: DataFrame, kept_tiles: DataFrame) -> DataFrame:
    """P9 — restrict the exploded assignment relation to surviving tiles
    (left-semi join ≡ the reference's bitset clear loop,
    MapSplit.java:1128-1145)."""
    return assignments.join(
        kept_tiles.select("tile_x", "tile_y").distinct(), ["tile_x", "tile_y"], "left_semi"
    )


def min_zone_fn(outers, inners, use_index: bool | str = "auto"):
    """(px, py) → int32 min-containing-zone array (−1 outside all
    outers or inside a hole) — the vectorized kernel shared by the
    batch geofence (operators/geofence.py) and its streaming twin
    (streaming/geofence_stream.py)."""
    if use_index is True or (use_index == "auto"
                             and len(outers) >= STRTREE_MIN_RINGS):
        tree = build_strtree(np.array([b for _, b in outers]))
        flat = _flatten_rings(outers)
        pairs_fn = lambda px, py: _pairs_indexed(px, py, flat, tree)  # noqa: E731
    else:
        pairs_fn = lambda px, py: _pairs_linear(px, py, outers)  # noqa: E731
    in_inner = _membership_fn(inners, use_index)

    def zones(px: np.ndarray, py: np.ndarray) -> np.ndarray:
        out = np.full(len(px), -1, dtype=np.int32)
        p_idx, r_idx = pairs_fn(px, py)
        if p_idx.size:
            # min zone per point: reverse-sorted fill leaves the minimum
            order = np.argsort(r_idx, kind="stable")[::-1]
            out[p_idx[order]] = r_idx[order].astype(np.int32)
        if inners:
            out[in_inner(px, py)] = -1
        return out

    return zones
