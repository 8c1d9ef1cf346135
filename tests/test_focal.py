"""Focal (neighborhood) statistics — scatter-kernel operator vs an
independent Python GATHER recompute, edge clamping, radius-0 identity,
and the one-exchange plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapsplit_spark.operators.focal import focal_sum


def _gather(counts: dict, zoom: int, radius: int) -> dict:
    """Independent formulation: for every candidate cell, gather the
    populated tiles within Chebyshev radius."""
    n = 1 << zoom
    out = {}
    cells = {
        (x + dx, y + dy)
        for x, y in counts
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    }
    for cx, cy in cells:
        if not (0 <= cx < n and 0 <= cy < n):
            continue
        vals = [
            v for (x, y), v in counts.items()
            if abs(x - cx) <= radius and abs(y - cy) <= radius
        ]
        out[(cx, cy)] = (sum(vals), len(vals))
    return out


def _run(spark, counts: dict, zoom: int, radius: int) -> dict:
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in counts.items()],
        "tile_x long, tile_y long, n long",
    )
    return {
        (r.tile_x, r.tile_y): (r.focal_sum, r.n_contrib)
        for r in focal_sum(df, zoom, radius).collect()
    }


def test_focal_sum_matches_gather_recompute(spark):
    counts = {(5, 5): 1, (6, 5): 2, (6, 6): 4, (20, 20): 7}
    for radius in (1, 2):
        assert _run(spark, counts, 8, radius) == _gather(counts, 8, radius)


def test_focal_sum_clamps_at_grid_edges(spark):
    zoom = 3  # 8×8 grid; corner and far-edge tiles
    counts = {(0, 0): 3, (7, 7): 5}
    got = _run(spark, counts, zoom, 1)
    assert got == _gather(counts, zoom, 1)
    assert all(0 <= x < 8 and 0 <= y < 8 for x, y in got)
    assert got[(0, 0)] == (3, 1) and got[(1, 1)] == (3, 1)


def test_focal_radius_zero_is_identity(spark):
    counts = {(2, 3): 9, (4, 4): 1}
    got = _run(spark, counts, 6, 0)
    assert got == {(2, 3): (9, 1), (4, 4): (1, 1)}


def test_focal_plan_one_exchange_no_python(spark):
    df = spark.createDataFrame([(1, 1, 1)], "tile_x long, tile_y long, n long")
    plan = focal_sum(df, 8, 1)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1          # scatter is map-side
    assert "partial_sum" in plan                # map-side combine
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
