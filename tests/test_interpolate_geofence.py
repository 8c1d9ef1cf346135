"""IDW grid interpolation (operators/interpolate.py) and geofence
transitions (operators/geofence.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mapsplit_spark import tilemath
from mapsplit_spark.operators.interpolate import idw_grid

EARTH_R_KM = 6371.0088


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2)
         * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2)
    return 2 * EARTH_R_KM * math.asin(math.sqrt(a))


def _center(x, y, zoom):
    n = 1 << zoom
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 0.5) / n))))
    return lon, lat


def test_idw_matches_python_recompute(spark):
    """Random samples → per-cell estimate recomputed independently in
    Python with the same integer quantization."""
    zoom, radius = 6, 1
    rng = np.random.default_rng(9)
    n = 400
    pdf = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-170, 170, n),
        "lat": rng.uniform(-80, 80, n),
        "value": np.round(rng.uniform(0, 500, n), 2),
    })
    got = {(r.tile_x, r.tile_y): (r.n_samples, r.est_value)
           for r in idw_grid(spark.createDataFrame(pdf), "pid", "lon", "lat",
                             "value", zoom, radius).collect()}

    # python gather recompute
    cells: dict[tuple[int, int], list] = {}
    grid_n = 1 << zoom
    for row in pdf.itertuples():
        tx = int(tilemath.lon2tx(row.lon, zoom))
        ty = int(tilemath.lat2ty(row.lat, zoom))
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                x, y = tx + dx, ty + dy
                if 0 <= x < grid_n and 0 <= y < grid_n:
                    clon, clat = _center(x, y, zoom)
                    d = _hav(row.lat, row.lon, clat, clon)
                    w = round(1e12 / (d * d + 1.0))
                    cells.setdefault((x, y), []).append(
                        (w, w * round(row.value * 100)))
    want = {}
    for k, ws in cells.items():
        den = sum(w for w, _ in ws)
        num = sum(wv for _, wv in ws)
        want[k] = (len(ws), round(num / den / 100.0, 4))
    assert got == want


def test_idw_single_shuffle(spark):
    df = spark.range(50).selectExpr(
        "id AS pid", "CAST(id % 360 - 180 AS DOUBLE) AS lon",
        "CAST(id % 160 / 2.0 - 40 AS DOUBLE) AS lat",
        "CAST(id AS DOUBLE) AS value")
    plan = idw_grid(df, "pid", "lon", "lat", "value", 5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def _ring(vs):
    r = np.array(vs, dtype=np.float64)
    return (r, (r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()))


def test_zone_transitions_hand_traced(spark):
    """One user walks outside → zone0 → zone0 → overlap(z0∩z1) → z1 →
    outside; expected transitions at each boundary, overlap resolves to
    the min zone, no row for the unchanged step."""
    from mapsplit_spark.operators.geofence import zone_transitions

    z0 = _ring([(0.0, -10.0), (10.0, -9.5), (10.0, 10.0), (0.0, 9.5)])
    z1 = _ring([(5.0, -10.2), (15.0, -9.7), (15.0, 10.2), (5.0, 9.7)])
    path = [(-5.0, 0.0), (2.0, 0.0), (3.0, 1.0), (7.0, 0.0),
            (12.0, 0.0), (20.0, 0.0)]
    ev = spark.createDataFrame(pd.DataFrame({
        "user_id": [1] * 6,
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(6), "min"),
        "event_id": range(6),
        "lon": [p[0] for p in path],
        "lat": [p[1] for p in path],
    }))
    rows = sorted(
        (r.event_id, r.prev_zone, r.zone)
        for r in zone_transitions(ev, "user_id", "ts", "event_id",
                                  "lon", "lat", [z0, z1]).collect()
    )
    assert rows == [
        (1, -1, 0),   # enter z0
        (4, 0, 1),    # overlap (still 0) → z1-only: min-zone rule held at 3
        (5, 1, -1),   # exit
    ]


def test_zone_transitions_hole_drops_membership(spark):
    """A point inside a hole counts as outside (zone −1)."""
    from mapsplit_spark.operators.geofence import zone_transitions

    outer = _ring([(0.0, -10.0), (10.0, -9.5), (10.0, 10.0), (0.0, 9.5)])
    hole = _ring([(4.0, -2.0), (6.0, -1.9), (6.0, 2.0), (4.0, 1.9)])
    ev = spark.createDataFrame(pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(3), "min"),
        "event_id": range(3),
        "lon": [2.0, 5.0, 2.0],   # in → hole → in
        "lat": [0.0, 0.0, 0.0],
    }))
    rows = sorted(
        (r.event_id, r.prev_zone, r.zone)
        for r in zone_transitions(ev, "user_id", "ts", "event_id",
                                  "lon", "lat", [outer], [hole]).collect()
    )
    assert rows == [(1, 0, -1), (2, -1, 0)]


def test_idw_drops_null_valued_samples(spark):
    """A NULL-valued sample must not add denominator weight."""
    pdf = pd.DataFrame({
        "pid": [1, 2],
        "lon": [10.0, 10.001],
        "lat": [10.0, 10.001],
        "value": [40.0, None],
    })
    rows = idw_grid(spark.createDataFrame(pdf), "pid", "lon", "lat",
                    "value", 6).collect()
    assert rows and all(r.est_value == 40.0 and r.n_samples == 1 for r in rows)
