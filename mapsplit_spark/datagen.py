"""Deterministic synthetic input tables (FIXTURES.md).

Generates the `images` table (exact `input_hint` schema + derived
lat/lon), the `sessions` grouped-geometry table (way/relation analog)
and `clip_polygons`, all as parquet under a target directory.  Every
value is a pure function of the row index (seeded), so the tables are
reproducible and the pure-numpy oracle can recompute expected outputs
independently.

Scales: ``n_images = int(10_000 * sf)`` (FIXTURES.md §1).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import geo, imaging

_SIZES = np.array([16, 32, 64])
_WORDS = np.array([
    "sunset", "harbor", "street", "market", "forest", "rooftop", "bridge",
    "festival", "mountain", "river", "portrait", "crowd", "mural", "garden",
    "skyline", "alley", "museum", "beach", "temple", "station",
])


def make_images(n: int, with_bytes: bool = True) -> pa.Table:
    idx = np.arange(n, dtype=np.int64)
    image_id = np.array([f"img{i:012d}" for i in idx])
    w = _SIZES[(geo.splitmix64(idx.astype(np.uint64) ^ np.uint64(11)) % 3).astype(np.int64)]
    h = _SIZES[(geo.splitmix64(idx.astype(np.uint64) ^ np.uint64(13)) % 3).astype(np.int64)]
    fmt = np.where(geo.splitmix64(idx.astype(np.uint64) ^ np.uint64(17)) % 2 == 0, "png", "jpeg")
    lat, lon = geo.geo(idx)

    # deterministic event time (ms): Jan 2024 + up to ~60 days per id —
    # drives the appointment-date incremental mechanism (S5/P3)
    ts_ms = np.int64(1_704_067_200_000) + (
        geo.splitmix64(idx.astype(np.uint64) ^ np.uint64(23)) % np.uint64(5_184_000_000)
    ).astype(np.int64)

    picks = geo.splitmix64(idx.astype(np.uint64) ^ np.uint64(19))
    captions = [
        f"caption for {image_id[i]}: "
        + " ".join(_WORDS[(int(picks[i]) >> (7 * k)) % len(_WORDS)] for k in range(5))
        for i in range(n)
    ]

    if with_bytes:
        blobs, phashes = [], []
        for i in range(n):
            px = imaging.synth_pixels(int(idx[i]), int(w[i]), int(h[i]))
            blobs.append(imaging.encode_image(px, str(fmt[i])))
            phashes.append(imaging.phash64(px))
    else:
        blobs = [b""] * n
        phashes = [0] * n

    return pa.table({
        "image_id": pa.array(image_id),
        "bytes": pa.array(blobs, type=pa.binary()),
        "w": pa.array(w.astype(np.int32)),
        "h": pa.array(h.astype(np.int32)),
        "fmt": pa.array(fmt),
        "caption": pa.array(captions),
        "phash": pa.array(np.array(phashes, dtype=np.int64)),
        "lat": pa.array(lat),
        "lon": pa.array(lon),
        "ts_ms": pa.array(ts_ms),
    })


def make_sessions(n_images: int, n_sessions: int) -> pa.Table:
    """Way-analog rows: ordered member image ids (FIXTURES.md §3).

    Deterministic membership: session s gets 3–12 member images chosen by
    splitmix64; sessions with ``s % 17 == 0`` include one missing member
    id (drop semantics, MapSplit.java:468-473); ``s % 13 == 0`` sessions
    get members drawn from one tight cluster so their tile footprint is
    compact (hole-fill candidates are built separately in tests).
    """
    sids, kinds, members, tags = [], [], [], []
    for s in range(n_sessions):
        h0 = geo.splitmix64(np.uint64(s) ^ np.uint64(0xBEEF))
        k = 3 + int(h0 % np.uint64(10))
        ms = [
            f"img{int(geo.splitmix64(np.uint64(s * 1000 + j)) % np.uint64(n_images)):012d}"
            for j in range(k)
        ]
        if s % 17 == 0:
            ms[1] = f"img{n_images + 7:012d}"  # dangling ref → way dropped
        sids.append(f"ses{s:08d}")
        kinds.append("session")
        members.append(ms)
        tags.append({"type": "multipolygon"} if s % 5 == 0 else {})
    # relation-analog collections over sessions, incl. a forward ref chain
    for c in range(max(2, n_sessions // 10)):
        sids.append(f"col{c:08d}")
        kinds.append("collection")
        ms = [f"ses{(c * 3 + j) % n_sessions:08d}" for j in range(3)]
        if c % 4 == 0:  # forward reference to a later collection (fixed point)
            ms.append(f"col{(c + 1) % max(2, n_sessions // 10):08d}")
        members.append(ms)
        tags.append({})
    return pa.table({
        "session_id": pa.array(sids),
        "kind": pa.array(kinds),
        "member_ids": pa.array(members, type=pa.list_(pa.string())),
        "tags": pa.array(tags, type=pa.map_(pa.string(), pa.string())),
    })


def make_clip_polygons() -> pa.Table:
    """One convex polygon over cluster 0 + one polygon with a hole
    (.poly analog, FIXTURES.md §4)."""
    clon, clat = geo._cluster_centers()
    cx, cy = float(clon[0]), float(clat[0])
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    outer = [(cx + 2.0 * np.cos(a), cy + 1.5 * np.sin(a)) for a in ang]
    hole = [(cx + 0.4 * np.cos(a), cy + 0.3 * np.sin(a)) for a in ang]
    rows = {
        "poly_id": ["vaduz", "donut", "donut"],
        "ring_id": [0, 0, 1],
        "is_hole": [False, False, True],
        "coords": [
            [{"lon": x, "lat": y} for x, y in outer],
            [{"lon": x + 5.0, "lat": y} for x, y in outer],
            [{"lon": x + 5.0, "lat": y} for x, y in hole],
        ],
    }
    coord_t = pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))
    return pa.table({
        "poly_id": pa.array(rows["poly_id"]),
        "ring_id": pa.array(rows["ring_id"], type=pa.int32()),
        "is_hole": pa.array(rows["is_hole"]),
        "coords": pa.array(rows["coords"], type=coord_t),
    })


def write_fixture_dir(out_dir: str, sf: float = 0.1, with_bytes: bool = True) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    n = max(16, int(10_000 * sf))
    images = make_images(n, with_bytes=with_bytes)
    sessions = make_sessions(n, max(4, n // 20))
    polys = make_clip_polygons()
    pq.write_table(images, os.path.join(out_dir, "images.parquet"))
    pq.write_table(sessions, os.path.join(out_dir, "sessions.parquet"))
    pq.write_table(polys, os.path.join(out_dir, "clip_polygons.parquet"))
    return {"n_images": n, "n_sessions": sessions.num_rows}


if __name__ == "__main__":
    import sys
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/data/img_sf{sf}"
    print(write_fixture_dir(out, sf), "→", out)
