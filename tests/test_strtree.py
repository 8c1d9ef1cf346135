"""STR-tree polygon index: packing invariants, batch-query vs brute
force, and the indexed clip path vs the linear scan (bit-equality).

The north-star PIP-join shape: thousands of boundary rings broadcast
as a packed index, points tested inside Arrow batches.  Reference
analog: clipPoly / isInside (MapSplit.java:999-1145) — one outline,
linear scan; the tree must reproduce that semantics exactly at any
ring count.
"""

from __future__ import annotations

import numpy as np
import pytest

from mapsplit_spark.operators.clip import (
    _flatten_rings,
    _in_any,
    _in_any_indexed,
    _membership_fn,
    clip_points,
    clip_points_bc,
    broadcast_polygon_index,
    STRTREE_MIN_RINGS,
)
from mapsplit_spark.strtree import build_strtree, query_strtree, QUERY_CHUNK


def _rand_ring(rng, cx, cy, r, k=8):
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = rng.uniform(0.3 * r, r, k)
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    bbox = (ring[:, 0].min(), ring[:, 0].max(),
            ring[:, 1].min(), ring[:, 1].max())
    return ring, bbox


def _ring_set(rng, n, rmin=0.5, rmax=15.0, kmax=24):
    return [
        _rand_ring(rng, rng.uniform(-170, 170), rng.uniform(-80, 80),
                   rng.uniform(rmin, rmax), k=int(rng.integers(3, kmax)))
        for _ in range(n)
    ]


def test_query_matches_bruteforce_bbox_candidates():
    rng = np.random.default_rng(11)
    rings = _ring_set(rng, 137)
    boxes = np.array([b for _, b in rings])
    tree = build_strtree(boxes)
    px = rng.uniform(-180, 180, 3000)
    py = rng.uniform(-85, 85, 3000)
    p_idx, r_idx = query_strtree(tree, px, py)
    got = set(zip(p_idx.tolist(), r_idx.tolist()))
    # brute force: every (point, ring) bbox containment
    inx = (px[:, None] >= boxes[None, :, 0]) & (px[:, None] <= boxes[None, :, 1])
    iny = (py[:, None] >= boxes[None, :, 2]) & (py[:, None] <= boxes[None, :, 3])
    want = set(zip(*np.nonzero(inx & iny)))
    want = {(int(p), int(r)) for p, r in want}
    assert got == want


def test_query_chunking_is_transparent():
    rng = np.random.default_rng(12)
    rings = _ring_set(rng, 64)
    tree = build_strtree(np.array([b for _, b in rings]))
    n = QUERY_CHUNK + 1234           # forces the chunked path
    px = rng.uniform(-180, 180, n)
    py = rng.uniform(-85, 85, n)
    p_all, r_all = query_strtree(tree, px, py)
    # same result as two manual halves
    h = n // 2
    p1, r1 = query_strtree(tree, px[:h], py[:h])
    p2, r2 = query_strtree(tree, px[h:], py[h:])
    got = sorted(zip(p_all.tolist(), r_all.tolist()))
    want = sorted(zip(p1.tolist() + (p2 + h).tolist(), r1.tolist() + r2.tolist()))
    assert got == want


@pytest.mark.parametrize("n_rings", [1, 2, 15, 16, 17, 57, 300, 1000])
def test_indexed_membership_bitequal_linear(n_rings):
    rng = np.random.default_rng(n_rings)
    rings = _ring_set(rng, n_rings)
    px = rng.uniform(-180, 180, 5000)
    py = rng.uniform(-85, 85, 5000)
    lin = _in_any(px, py, rings)
    idx = _in_any_indexed(px, py, _flatten_rings(rings),
                          build_strtree(np.array([b for _, b in rings])))
    assert np.array_equal(lin, idx)


def test_membership_fn_auto_threshold():
    rng = np.random.default_rng(3)
    small = _ring_set(rng, STRTREE_MIN_RINGS - 1)
    large = _ring_set(rng, STRTREE_MIN_RINGS)
    px = rng.uniform(-180, 180, 200)
    py = rng.uniform(-85, 85, 200)
    # either path, same answer — and "auto" must not change results
    for rings in (small, large):
        auto = _membership_fn(rings, "auto")(px, py)
        lin = _membership_fn(rings, False)(px, py)
        forced = _membership_fn(rings, True)(px, py)
        assert np.array_equal(auto, lin)
        assert np.array_equal(auto, forced)


def test_degenerate_and_edge_rings():
    # collinear "ring", tiny ring, ring crossing the dateline bbox-wise
    rng = np.random.default_rng(5)
    rings = [
        (np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]), (0.0, 2.0, 0.0, 0.0)),
        (np.array([[10.0, 10.0], [10.0001, 10.0], [10.0, 10.0001]]),
         (10.0, 10.0001, 10.0, 10.0001)),
        _rand_ring(rng, 179.5, 0.0, 3.0),
    ] + _ring_set(rng, 40)
    px = rng.uniform(-180, 180, 4000)
    py = rng.uniform(-85, 85, 4000)
    lin = _in_any(px, py, rings)
    idx = _in_any_indexed(px, py, _flatten_rings(rings),
                          build_strtree(np.array([b for _, b in rings])))
    assert np.array_equal(lin, idx)


def test_clip_points_indexed_and_bc_match_linear(spark):
    rng = np.random.default_rng(17)
    outers = _ring_set(rng, 48, rmin=2, rmax=20)
    inners = _ring_set(rng, 20, rmin=0.5, rmax=4)
    pts = [(int(i), float(rng.uniform(-180, 180)), float(rng.uniform(-85, 85)))
           for i in range(4000)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    base = sorted(r.id for r in
                  clip_points(df, outers, inners, use_index=False).collect())
    idx = sorted(r.id for r in
                 clip_points(df, outers, inners, use_index=True).collect())
    assert base == idx
    bc = broadcast_polygon_index(spark, outers, inners)
    via_bc = sorted(r.id for r in clip_points_bc(df, bc).collect())
    assert base == via_bc
    bc.unpersist()


# --------------------------------------------------------- zonal assignment

def _zone_rings():
    import numpy as np

    def ring_np(vs):
        r = np.array(vs, dtype=np.float64)
        return (r, (r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()))

    sq = lambda cx, cy, h: [  # noqa: E731
        (cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h), (cx - h, cy + h)]
    outers = [ring_np(sq(0.0, 0.0, 2.0)),     # zone 0
              ring_np(sq(1.0, 0.0, 2.0)),     # zone 1 — overlaps zone 0
              ring_np(sq(50.0, 50.0, 1.0))]   # zone 2 — disjoint
    holes = [ring_np(sq(0.5, 0.0, 0.25))]     # hole inside zones 0 and 1
    return outers, holes


def _zone_points(spark):
    pts = [
        (1, -1.5, 0.0),   # zone 0 only
        (2, 0.2, 0.0),    # zones 0 and 1 (overlap)
        (3, 2.5, 0.0),    # zone 1 only
        (4, 50.0, 50.0),  # zone 2
        (5, 0.5, 0.0),    # inside the hole → dropped
        (6, 20.0, 20.0),  # nowhere
    ]
    return spark.createDataFrame(pts, "pid long, lon double, lat double")


def test_zone_assign_matches_expected_membership(spark):
    from mapsplit_spark.operators.clip import zone_assign

    outers, holes = _zone_rings()
    got = sorted(
        (r.pid, r.zone) for r in
        zone_assign(_zone_points(spark), outers, holes,
                    id_col="pid", use_index=False).collect()
    )
    assert got == [(1, 0), (2, 0), (2, 1), (3, 1), (4, 2)]


def test_zone_assign_indexed_equals_linear(spark):
    from mapsplit_spark.operators.clip import zone_assign

    outers, holes = _zone_rings()
    pts = _zone_points(spark)
    lin = sorted((r.pid, r.zone) for r in
                 zone_assign(pts, outers, holes, id_col="pid",
                             use_index=False).collect())
    idx = sorted((r.pid, r.zone) for r in
                 zone_assign(pts, outers, holes, id_col="pid",
                             use_index=True).collect())
    assert lin == idx


def test_zone_assign_no_holes(spark):
    from mapsplit_spark.operators.clip import zone_assign

    outers, _ = _zone_rings()
    got = sorted(
        (r.pid, r.zone) for r in
        zone_assign(_zone_points(spark), outers, [],
                    id_col="pid", use_index=True).collect()
    )
    # the hole point (5) now lands in both overlapping zones
    assert got == [(1, 0), (2, 0), (2, 1), (3, 1), (4, 2), (5, 0), (5, 1)]
