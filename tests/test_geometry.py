"""Per-way polyline geometry — engine vs an independent Python
recompute (math.* haversine), degenerate ways, and the shared-exchange
plan pin."""

from __future__ import annotations

import math

from mapsplit_spark.operators.geometry import polyline_stats


def _haversine_km(lat1, lon1, lat2, lon2):
    return 2.0 * 6371.0088 * math.asin(math.sqrt(
        math.sin(math.radians(lat2 - lat1) / 2.0) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2.0) ** 2
    ))


def _python_stats(ways: dict):
    out = {}
    for wid, pts in ways.items():
        pts = sorted(pts)  # by seq
        coords = [(lon, lat) for _, lon, lat in pts]
        length = sum(
            round(_haversine_km(a[1], a[0], b[1], b[0]) * 1e6)
            for a, b in zip(coords, coords[1:])
        )
        lon_u = [round(lon * 1e6) for lon, _ in coords]
        lat_u = [round(lat * 1e6) for _, lat in coords]
        out[wid] = (
            len(coords), length,
            min(lon_u), max(lon_u), min(lat_u), max(lat_u),
            round(sum(lon_u) / len(lon_u)), round(sum(lat_u) / len(lat_u)),
        )
    return out


def _mk_df(spark, ways: dict):
    rows = [
        (wid, seq, lon, lat)
        for wid, pts in ways.items()
        for seq, lon, lat in pts
    ]
    return spark.createDataFrame(
        rows, "way_id long, seq int, lon double, lat double")


def test_polyline_stats_match_python_recompute(spark):
    ways = {
        1: [(1, 13.4, 52.5), (2, 13.5, 52.6), (3, 13.3, 52.7)],
        2: [(1, -74.0, 40.7), (2, -73.9, 40.8)],
        3: [(2, 151.2, -33.9), (1, 151.1, -33.8), (3, 151.3, -34.0)],  # out-of-order seq
    }
    got = {
        r.way_id: (r.n_pts, r.length_mm, r.min_lon_u, r.max_lon_u,
                   r.min_lat_u, r.max_lat_u, r.c_lon_u, r.c_lat_u)
        for r in _mk_df(spark, ways)
        .transform(lambda d: polyline_stats(d, "way_id", "seq", "lon", "lat"))
        .collect()
    }
    assert got == _python_stats(ways)


def test_single_point_way_has_zero_length(spark):
    ways = {7: [(1, 2.35, 48.85)]}
    [r] = polyline_stats(_mk_df(spark, ways), "way_id", "seq", "lon", "lat").collect()
    assert (r.n_pts, r.length_mm) == (1, 0)
    assert r.c_lon_u == r.min_lon_u == r.max_lon_u == round(2.35 * 1e6)


def test_antimeridian_edge_uses_raw_coordinate_delta(spark):
    """Documents the vertex-list semantics: an edge from lon 179.9 to
    −179.9 measures the long way around (the reference's node lists
    are likewise raw coordinates, no wraparound normalization)."""
    ways = {1: [(1, 179.9, 0.0), (2, -179.9, 0.0)]}
    [r] = polyline_stats(_mk_df(spark, ways), "way_id", "seq", "lon", "lat").collect()
    expect = round(_haversine_km(0.0, 179.9, 0.0, -179.9) * 1e6)
    assert r.length_mm == expect


def test_polyline_plan_shares_window_exchange(spark):
    """lead() window and the per-way aggregate group on the same key —
    exactly ONE shuffle; no Python anywhere."""
    df = _mk_df(spark, {1: [(1, 0.0, 0.0), (2, 1.0, 1.0)]})
    # createDataFrame plans carry no exchange of their own at this size,
    # so every Exchange in the tree belongs to the operator
    plan = (
        polyline_stats(df, "way_id", "seq", "lon", "lat")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
