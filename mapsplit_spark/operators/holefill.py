"""§2.6 — flood-fill hole patching for multi-tile geometries.

Reference: checkAndFill (MapSplit.java:253-352) — a closed ring of ≥ 8
tiles can enclose tiles containing none of its points; those "holes"
must be added to the geometry's tile set (pad bbox by 2, flood-fill the
outside from (1,1) with a 4-neighbourhood, unreached cells are holes).
Trigger: tile-set size ≥ 8 (MapSplit.java:491-493).

Spark-first: this is inherently per-group imperative logic, so it is the
one place we drop to ``applyInPandas`` — Arrow-batched, keyed by a HASH
BUCKET of the group id (not the group id itself: one Arrow/pandas
round-trip per group measured ~4 ms of fixed overhead × tens of
thousands of candidate groups = the dominant cost of the whole operator
at sf0.1; r6 guide-§4 fix).  Each Python call walks every group in its
bucket via one numpy sort + split.  The only shuffle is the groupBy;
groups below the ≥ 8-tile trigger are filtered out BEFORE the shuffle
(a map-side count aggregation), so at 100 TB the expensive path sees
only the tiny fraction of large geometries.

Per-group kernel (r6): the fill runs as RUN-LENGTH connected-component
labelling on a COORDINATE-COMPRESSED grid (every member coordinate ±1
plus the padded bbox edges).  Compression preserves 4-connectivity
exactly — every maximal member-free row/column strip keeps one
representative — and the run-length pass unions O(n) empty runs
instead of BFS-stepping O(n²) compressed cells (the BFS frontier loop
was 1.5-7 ms/group on scattered z13 geometries; the run CCL is
~100 µs).  Outside = every empty component touching the padded border
ring (the ring is member-free by construction, so it is one component
and contains the reference's (1,1) seed); unreached interior cells are
holes, expanded back to real-coordinate rectangles on output.  The BFS
mirror is kept as ``_fill_one_bfs`` and differentially tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compress(vals: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Sorted unique coordinates: members ±1 plus the pad-2 bbox edges —
    one representative per maximal member-free strip."""
    return np.unique(np.concatenate([vals - 1, vals, vals + 1, [lo, hi]]))


# hole-OUTPUT guard: a geometry enclosing a continent-sized region would
# expand to tens of millions of patch tiles (the reference would add
# them all too — and blow its tile sets); such groups are left unpatched
# with a loud executor-log warning instead.  This bounds output size and
# Python enumeration time; detection is exact (summed rectangle areas
# from the compressed fill, BEFORE enumeration).
MAX_HOLES_PER_GROUP = 2_000_000


def _grid_setup(xs: np.ndarray, ys: np.ndarray):
    min_x, max_x = int(xs.min()) - 2, int(xs.max()) + 2
    min_y, max_y = int(ys.min()) - 2, int(ys.max()) + 2
    cx = _compress(xs, min_x, max_x)
    cy = _compress(ys, min_y, max_y)
    sx, sy = len(cx), len(cy)
    grid = np.zeros((sy, sx), dtype=bool)
    grid[np.searchsorted(cy, ys), np.searchsorted(cx, xs)] = True
    return cx, cy, sx, sy, grid


def _expand_holes(hy: np.ndarray, hx: np.ndarray, cx: np.ndarray,
                  cy: np.ndarray, sx: int, sy: int,
                  max_holes: int) -> list[tuple[int, int]]:
    """Compressed hole cells → real-coordinate tile list, with the exact
    pre-enumeration size guard."""
    x_next = np.append(cx[1:], cx[-1] + 1)
    y_next = np.append(cy[1:], cy[-1] + 1)
    widths = (x_next - cx)[hx]
    heights = (y_next - cy)[hy]
    total = int((widths * heights).sum())
    if total > max_holes:
        import logging

        logging.getLogger(__name__).warning(
            "fill_holes: geometry encloses %d tiles (> %d) — left unpatched",
            total, max_holes,
        )
        return []
    out: list[tuple[int, int]] = []
    for j, i in zip(hy, hx):
        # compressed hole cell (i, j) ⇒ the member-free real rectangle
        # [cx[i], cx[i+1]) × [cy[j], cy[j+1]) is entirely enclosed
        x_hi = cx[i + 1] if i + 1 < sx else cx[i] + 1
        y_hi = cy[j + 1] if j + 1 < sy else cy[j] + 1
        for x in range(int(cx[i]), int(x_hi)):
            for y in range(int(cy[j]), int(y_hi)):
                out.append((x, y))
    return out


def _fill_one(xs: np.ndarray, ys: np.ndarray,
              max_holes: int = MAX_HOLES_PER_GROUP) -> list[tuple[int, int]]:
    """Holes for one geometry's member tiles — run-length CCL on the
    compressed grid.  Semantics identical to ``_fill_one_bfs`` (the
    reference checkAndFill): the walk never enters compressed row/col 0,
    and a cell is OUTSIDE iff its empty 4-component touches the padded
    border ring of the [1:, 1:] subgrid (which contains the (1,1) seed
    and is fully member-free, hence one component)."""
    cx, cy, sx, sy, grid = _grid_setup(xs, ys)
    if sx < 4 or sy < 4:
        return []
    # empty mask of the subgrid rows/cols >= 1 (the BFS domain)
    empty = ~grid[1:, 1:]
    n_rows, n_cols = empty.shape

    # maximal horizontal runs of empty cells per row (vectorized):
    # pad each row with False so run starts/ends are diffs
    padded = np.zeros((n_rows, n_cols + 2), dtype=bool)
    padded[:, 1:-1] = empty
    d = padded[:, 1:].astype(np.int8) - padded[:, :-1].astype(np.int8)
    row_idx, start_col = np.where(d == 1)
    _, end_col = np.where(d == -1)  # same count/order as starts
    # runs: [start_col, end_col) in subgrid columns, grouped by row
    n_runs = len(row_idx)
    if n_runs == 0:
        return []

    parent = list(range(n_runs))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    # rows are emitted in order by np.where; runs of row r occupy a
    # contiguous index range — walk adjacent row pairs with two pointers
    row_breaks = np.searchsorted(row_idx, np.arange(n_rows + 1))
    for r in range(1, n_rows):
        a0, a1 = row_breaks[r - 1], row_breaks[r]
        b0, b1 = row_breaks[r], row_breaks[r + 1]
        i, j = a0, b0
        while i < a1 and j < b1:
            # overlap of [s,e) intervals = 4-connectivity between rows
            if start_col[i] < end_col[j] and start_col[j] < end_col[i]:
                union(i, j)
            if end_col[i] < end_col[j]:
                i += 1
            else:
                j += 1

    # outside = components touching the subgrid border ring
    touches = (
        (row_idx == 0) | (row_idx == n_rows - 1)
        | (start_col == 0) | (end_col == n_cols)
    )
    outside_roots = {find(k) for k in np.flatnonzero(touches)}
    hole_runs = [k for k in range(n_runs) if find(k) not in outside_roots]
    if not hole_runs:
        return []
    hx_list = []
    hy_list = []
    for k in hole_runs:
        cols = np.arange(start_col[k], end_col[k])
        hx_list.append(cols + 1)  # subgrid → full-grid offset
        hy_list.append(np.full(len(cols), row_idx[k] + 1))
    hx = np.concatenate(hx_list)
    hy = np.concatenate(hy_list)
    return _expand_holes(hy, hx, cx, cy, sx, sy, max_holes)


def _fill_one_bfs(xs: np.ndarray, ys: np.ndarray,
                  max_holes: int = MAX_HOLES_PER_GROUP) -> list[tuple[int, int]]:
    """Reference-shaped frontier BFS on the compressed grid — the r5
    kernel, kept as the differential-test mirror of ``_fill_one``."""
    cx, cy, sx, sy, grid2 = _grid_setup(xs, ys)
    grid = grid2.reshape(-1)

    outside = np.zeros(sy * sx, dtype=bool)
    seed = 1 * sx + 1  # compressed (1,1) == real (min+1, min+1): cx[1]=min_x+1
    frontier = np.empty(0, dtype=np.int64)
    if not grid[seed]:
        outside[seed] = True
        frontier = np.array([seed], dtype=np.int64)
    while frontier.size:  # frontier BFS: O(cells) total like the BitSet BFS
        col = frontier % sx
        row = frontier // sx
        # 4-neighbourhood, never into row/col 0 (MapSplit.java:311-316)
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

    holes = (~grid & ~outside).reshape(sy, sx)
    holes[0, :] = False
    holes[:, 0] = False
    hy, hx = np.where(holes)
    return _expand_holes(hy, hx, cx, cy, sx, sy, max_holes)


def fill_holes(group_tiles: DataFrame, group_col: str = "group_id",
               min_tiles: int = 8, materialize: bool = False,
               assume_distinct: bool = False,
               n_buckets: int = 256) -> DataFrame:
    """(group_id, tile_x, tile_y) → same relation + patched hole tiles.

    Small groups (< min_tiles, MapSplit.java:491-493) bypass the Python
    stage entirely via a pre-shuffle semi-join on a count aggregate.

    ``assume_distinct`` skips the final (group, tile) dedupe — safe when
    the input relation is already distinct (way_tiles / assign→expand
    outputs), because patched holes are by construction tiles NOT in
    their group's member set and each hole is emitted once; this removes
    a full shuffle of the output relation (r6).

    ``n_buckets``: candidate groups hash into this many applyInPandas
    calls (the zoom_map_df bucketing pattern) so the per-call
    Arrow/pandas overhead amortizes over ~|candidates|/n_buckets groups
    instead of being paid per group.

    The input relation feeds three consumers (count gate, candidate
    join, output union).  ``materialize`` checkpoints it once — measured
    SLOWER at sf0.1 for a cheap upstream (the eager barrier +
    serialization cost beats re-running the codegen subtree 3× in
    parallel), so it defaults off; callers with an expensive upstream
    should checkpoint that upstream themselves (q_session_holefill
    does).
    """
    src = group_tiles.select(
        F.col(group_col).alias("group_id"), "tile_x", "tile_y"
    )
    if materialize:
        src = src.localCheckpoint(eager=True)
    big = (
        src.groupBy("group_id").count()
        .filter(F.col("count") >= min_tiles)
        .select("group_id")
    )
    candidates = src.join(big, "group_id")  # AQE picks broadcast when small
    # explicit repartition on the group key: the fill is Python-CPU-heavy
    # but byte-light, and AQE's byte-sized coalescing would squeeze it
    # into 1-3 tasks (same fix as zoom_map_df; exempt from coalescing,
    # reused by the groupBy below)
    n_part = min(n_buckets,
                 src.sparkSession.sparkContext.defaultParallelism)
    bucketed = candidates.withColumn(
        "bucket", F.pmod(F.xxhash64("group_id"), F.lit(n_buckets))
    ).repartition(n_part, "bucket")

    def patch_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        gids = pdf["group_id"].to_numpy()
        xs = pdf["tile_x"].to_numpy(dtype=np.int64)
        ys = pdf["tile_y"].to_numpy(dtype=np.int64)
        order = np.argsort(gids, kind="stable")
        gids, xs, ys = gids[order], xs[order], ys[order]
        breaks = np.flatnonzero(
            np.r_[True, gids[1:] != gids[:-1], True]
        )
        out_g: list = []
        out_x: list = []
        out_y: list = []
        for s, e in zip(breaks[:-1], breaks[1:]):
            holes = _fill_one(xs[s:e], ys[s:e])
            for hx, hy in holes:
                out_g.append(gids[s])
                out_x.append(hx)
                out_y.append(hy)
        return pd.DataFrame({
            "group_id": pd.Series(out_g, dtype=pdf["group_id"].dtype),
            "tile_x": pd.Series(out_x, dtype="int64"),
            "tile_y": pd.Series(out_y, dtype="int64"),
        })

    gid_type = dict(src.dtypes)["group_id"]  # schema follows the caller's key type
    holes = bucketed.groupBy("bucket").applyInPandas(
        lambda key, pdf: patch_bucket(pdf),
        f"group_id {gid_type}, tile_x long, tile_y long",
    )
    out = src.unionByName(holes)
    if not assume_distinct:
        out = out.dropDuplicates(["group_id", "tile_x", "tile_y"])
    return out.withColumnRenamed("group_id", group_col)
