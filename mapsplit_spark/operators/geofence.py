"""Geofence transitions — spatio-temporal event detection: per user,
the moments the trace ENTERS or LEAVES a zone (enter/exit events of a
geofencing system, alerting/attribution surface of a tracking
pipeline).  Combines the engine's two join families: point-in-polygon
zone membership (the STR-tree Arrow kernel, clip.zone_assign) and
ordered window analytics (lag over the per-user timeline).

Shape: zone membership is map-side (rings broadcast once per executor,
candidates bounded by the tree); the min-zone fold and the id join
shuffle on the event id; the transition lag shuffles on the user — no
self-join of the event table against itself, no Python outside the
PIP kernel.

Zone convention: ``zone`` = the smallest index of a containing outer
ring, −1 when outside all rings (overlaps resolve to the lowest index
deterministically — same rule in the oracle's LEAST() restatement).
A transition row is emitted for every consecutive pair (by event time,
ties by id) whose zones differ; the first event of a user emits
nothing (no previous state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .clip import zone_assign


def zone_transitions(events: DataFrame, user_col: str, ts_col: str,
                     id_col: str, lon_col: str, lat_col: str,
                     outers, inners=()) -> DataFrame:
    """events(user, ts, id, lon, lat) × zones →
    (user_col, event_id, prev_zone, zone) — one row per enter/exit."""
    za = zone_assign(
        events.select(id_col, lon_col, lat_col), outers, list(inners),
        id_col=id_col, lon_col=lon_col, lat_col=lat_col,
    )
    zmin = za.groupBy(id_col).agg(F.min("zone").cast("int").alias("zone"))
    ev = (
        events.select(user_col, ts_col, id_col)
        .join(zmin, id_col, "left")
        .withColumn("zone", F.coalesce("zone", F.lit(-1)))
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        ev.withColumn("prev_zone", F.lag("zone").over(w))
        .filter(F.col("prev_zone").isNotNull()
                & (F.col("prev_zone") != F.col("zone")))
        .select(user_col, F.col(id_col).alias("event_id"),
                F.col("prev_zone").cast("int").alias("prev_zone"), "zone")
    )
