"""S7 — MBTiles export (MapSplit.java:1158-1166, 1353-1369, 1388-1408).

The reference writes per-tile PBF blobs into a SQLite `tiles` table keyed
(zoom_level, tile_column, tile_row) with the TMS y-flip
``y' = 2^z − y − 1`` (MapSplit.java:1359-1364) plus a `metadata` table
(format/minzoom/maxzoom/latest_date/bounds, Const.java:5-9).

Ours stores each tile's manifest JSON (or a mosaic blob when provided) —
SQLite is inherently single-writer, so this is a driver-side export for
bounded outputs; at 100 TB the per-tile parquet/Iceberg table from
``write_tiles`` is the real sink and MBTiles is a downstream packaging
step (one file per region via foreachPartition if ever needed).
"""

from __future__ import annotations

import json
import os
import sqlite3
import time

from pyspark.sql import DataFrame

FORMAT = "application/json"  # manifest payload (reference uses OSM PBF)
RASTER_FORMAT = "image/x-msim"  # mosaic blobs from the stub codec


def _write_sqlite(path: str, tile_rows, fmt: str, zooms: set,
                  fallback_zoom: int, latest_date_ms: int | None,
                  description: str) -> None:
    if os.path.exists(path):
        os.remove(path)
    conn = sqlite3.connect(path)
    try:
        cur = conn.cursor()
        cur.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        cur.execute(
            "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
            "tile_row INTEGER, tile_data BLOB)"
        )
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)"
        )
        cur.executemany("INSERT INTO tiles VALUES (?,?,?,?)", tile_rows)
        meta = {
            "name": "mapsplit_spark",
            "type": "baselayer",
            "version": "1",
            "description": description,
            "format": fmt,
            "minzoom": str(min(zooms) if zooms else fallback_zoom),
            "maxzoom": str(max(zooms) if zooms else fallback_zoom),
            "latest_date": str(latest_date_ms if latest_date_ms is not None
                               else int(time.time() * 1000)),
        }
        cur.executemany("INSERT INTO metadata VALUES (?,?)", meta.items())
        conn.commit()
    finally:
        conn.close()


def export_mbtiles(spark, manifests: DataFrame, path: str, zoom: int,
                   latest_date_ms: int | None = None) -> None:
    """Vector path: per-tile manifest JSON blobs."""
    rows = manifests.collect()
    zooms, out = set(), []
    for r in rows:
        z = r.zoom if "zoom" in manifests.columns else zoom
        zooms.add(z)
        tms_y = (1 << z) - r.tile_y - 1  # TMS flip, MapSplit.java:1359-1364
        blob = json.dumps(
            {"ids": list(r.element_ids), "n": r.n}, separators=(",", ":")
        ).encode()
        out.append((z, r.tile_x, tms_y, blob))
    _write_sqlite(path, out, FORMAT, zooms, zoom, latest_date_ms,
                  "tile manifests from mapsplit_spark")


def export_raster_mbtiles(spark, mosaics: DataFrame, path: str, zoom: int,
                          latest_date_ms: int | None = None) -> None:
    """Raster path: per-tile mosaic image blobs (operators/multimodal.
    tile_mosaics) — the raster side of the north star's raster↔vector
    tile rendering.  Same TMS flip + metadata layout."""
    rows = mosaics.collect()
    out = [
        (zoom, r.tile_x, (1 << zoom) - r.tile_y - 1, bytes(r.mosaic))
        for r in rows
    ]
    _write_sqlite(path, out, RASTER_FORMAT, {zoom}, zoom, latest_date_ms,
                  "raster tile mosaics from mapsplit_spark")
