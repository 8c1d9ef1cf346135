"""Grid-density clustering (DBSCAN over the tile grid) — engine vs an
independent Python union-find recompute, isolated-cell fallback, noise
labelling, and the no-theta-join plan pin."""

from __future__ import annotations

from mapsplit_spark.operators.clustering import (
    cluster_points,
    dense_cells,
    grid_clusters,
)
from mapsplit_spark.tilemath import lon2tx, lat2ty


def _union_find_clusters(points, zoom, min_pts):
    """Independent formulation: count per cell in Python, union
    8-adjacent dense cells with union-find, label by min cell key."""
    side = 1 << zoom
    counts: dict = {}
    for lon, lat in points:
        c = (lon2tx(lon, zoom), lat2ty(lat, zoom))
        counts[c] = counts.get(c, 0) + 1
    dense = {c: n for c, n in counts.items() if n >= min_pts}
    keys = {c: c[0] * side + c[1] for c in dense}
    parent = {k: k for k in keys.values()}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    cells = list(dense)
    for i, a in enumerate(cells):
        for b in cells[i + 1:]:
            if abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1:
                ra, rb = find(keys[a]), find(keys[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {c: (dense[c], find(keys[c])) for c in dense}


def _mk_df(spark, points):
    return spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(points)],
        "pid long, lon double, lat double",
    )


def _blob(cx, cy, k):
    """k points inside one zoom-6 cell centred near (cx, cy) degrees."""
    return [(cx + 0.01 * i, cy + 0.007 * i) for i in range(k)]


def test_grid_clusters_match_union_find(spark):
    zoom, min_pts = 6, 3
    # two touching dense blobs, one diagonal neighbour, one far blob,
    # and sparse noise
    points = (
        _blob(10.0, 10.0, 5) + _blob(15.7, 10.0, 4)    # adjacent cells
        + _blob(21.4, 12.9, 3)                          # diagonal to next
        + _blob(27.0, 18.5, 3)
        + _blob(-60.0, -30.0, 6)                        # isolated cluster
        + [(0.0, 0.0), (40.0, 40.0)]                    # noise
    )
    got = {
        (r.tile_x, r.tile_y): (r.n, r.cluster)
        for r in grid_clusters(_mk_df(spark, points), "pid", "lon", "lat",
                               zoom, min_pts).collect()
    }
    assert got == _union_find_clusters(points, zoom, min_pts)
    assert len({c for _, c in got.values()}) >= 2  # several components


def test_isolated_dense_cell_gets_own_key(spark):
    zoom = 6
    points = _blob(50.0, 50.0, 4)
    rows = grid_clusters(_mk_df(spark, points), "pid", "lon", "lat",
                         zoom, 3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.cluster == r.tile_x * (1 << zoom) + r.tile_y


def test_cluster_points_labels_noise_null(spark):
    zoom = 6
    points = _blob(10.0, 10.0, 5) + [(-120.0, 33.0)]
    rows = cluster_points(_mk_df(spark, points), "pid", "lon", "lat",
                          zoom, 3).collect()
    by_id = {r.pid: r.cluster for r in rows}
    assert sum(c is None for c in by_id.values()) == 1     # the lone point
    assert len({c for c in by_id.values() if c is not None}) == 1


def test_no_dense_cells_is_empty(spark):
    rows = grid_clusters(_mk_df(spark, [(1.0, 1.0), (50.0, 2.0)]),
                         "pid", "lon", "lat", 6, 3).collect()
    assert rows == []


def test_dense_edge_plan_has_no_theta_join(spark):
    """The engine's adjacency must stay a scatter + equi-join — the
    |dense|² theta join exists only in the DuckDB oracle."""
    df = _mk_df(spark, _blob(10.0, 10.0, 5) + _blob(15.7, 10.0, 4))
    plan = (
        grid_clusters(df, "pid", "lon", "lat", 6, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cluster_points_broadcast_guard_both_arms(spark, monkeypatch):
    """r6 (VERDICT r5 #6): cluster_points broadcasts the label relation
    only under the size cap; above it (forced via the cap) the plain
    join arm must produce identical labels."""
    import mapsplit_spark.operators.clustering as cl

    zoom = 6
    points = _blob(10.0, 10.0, 5) + _blob(60.0, -20.0, 4) + [(-120.0, 33.0)]
    df = _mk_df(spark, points)

    bcast = cl.cluster_points(df, "pid", "lon", "lat", zoom, 3)
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # guarded arm broadcasts

    monkeypatch.setattr(cl, "CLUSTER_BROADCAST_MAX_CELLS", 0)
    plain = cl.cluster_points(df, "pid", "lon", "lat", zoom, 3)
    a = {(r.pid, r.tile_x, r.tile_y, r.cluster) for r in bcast.collect()}
    b = {(r.pid, r.tile_x, r.tile_y, r.cluster) for r in plain.collect()}
    assert a == b
