"""spark-submit entry point — the engine's CLI, mirroring mapsplit's
surface (CommandLineParams.java:116-273) on Spark.

    spark-submit --py-files mapsplit_spark.zip jobs/split_job.py \
        --input /data/images.parquet --output /out/tiles \
        --zoom 13 --border 0.1 --optimize 2000 \
        [--poly /data/clip_polygons.parquet --poly-id vaduz] \
        [--mbtiles /out/tiles.mbtiles] [--complete-sessions ...]

Flag mapping: -z/--zoom, -b/--border, -O/--optimize, polygon clip ≡ -p,
--metadata ≡ -m (payload columns carried into tile outputs), MBTiles ≡ -M.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapsplit_spark.operators.assign import assign_and_expand, with_tile_id  # noqa: E402
from mapsplit_spark.operators.clip import clip_assignments, clip_tiles, load_rings  # noqa: E402
from mapsplit_spark.operators.optimize import merged_assignments  # noqa: E402
from mapsplit_spark.sinks.manifests import tile_manifests, write_tiles  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PySpark tile splitter (mapsplit semantics)")
    p.add_argument("--input", required=True, help="images parquet (image_id, lon, lat, ...)")
    p.add_argument("--output", required=True, help="output dir for tiles + manifests")
    p.add_argument("--zoom", type=int, default=13)
    p.add_argument("--border", type=float, default=0.0)
    p.add_argument("--optimize", type=int, default=0, metavar="NODE_LIMIT")
    p.add_argument("--poly", help="clip_polygons parquet")
    p.add_argument("--poly-id", default=None)
    p.add_argument("--mbtiles", help="also export an MBTiles file (manifest blobs)")
    p.add_argument("--raster-mbtiles",
                   help="also export raster MBTiles (per-tile mosaics from bytes)")
    p.add_argument("--id-col", default="image_id")
    p.add_argument("--lon-col", default="lon")
    p.add_argument("--lat-col", default="lat")
    p.add_argument("--payload", action="store_true",
                   help="materialize payload columns per tile (join bytes last)")
    p.add_argument("--workdir", default=None,
                   help="stage-checkpoint dir: enables kill/resume (pipeline.py)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from mapsplit_spark.session import get_spark

    spark = get_spark("split-job")
    t0 = time.time()
    src = spark.read.parquet(args.input)

    if args.workdir:
        # checkpoint-resumable path: stages persist under --workdir and a
        # re-run recomputes only unfinished stages (north_rule resume)
        from mapsplit_spark.pipeline import TilingPipeline

        pipe = TilingPipeline(
            spark, args.workdir, zoom=args.zoom, border=args.border,
            id_col=args.id_col, lon_col=args.lon_col, lat_col=args.lat_col,
            poly_path=args.poly, poly_id=args.poly_id, node_limit=args.optimize,
        )
        manifests = pipe.run(args.input)
        pairs = spark.read.parquet(os.path.join(
            args.workdir, "clip" if args.poly else "assign", "data"))
    else:
        points = src.select(args.id_col, args.lon_col, args.lat_col)
        pairs = assign_and_expand(points, args.id_col, args.lon_col, args.lat_col,
                                  args.zoom, args.border)

        if args.poly:
            outers, inners = load_rings(spark.read.parquet(args.poly), args.poly_id)
            kept = clip_tiles(pairs.select("tile_x", "tile_y").distinct(),
                              outers, inners, args.zoom)
            pairs = clip_assignments(pairs, kept)

        if args.optimize > 0:
            merged = merged_assignments(pairs, args.zoom, args.optimize)
            manifests = (
                merged.groupBy("zoom", "tile_x", "tile_y")
                .agg(F.array_sort(F.collect_list("element_id")).alias("element_ids"),
                     F.count("*").alias("n"))
            )
        else:
            manifests = tile_manifests(pairs, args.zoom)

    manifests.write.mode("overwrite").parquet(os.path.join(args.output, "manifests"))

    if args.payload:
        payload = with_tile_id(pairs, args.zoom).join(
            src, pairs["element_id"] == src[args.id_col]
        ).drop(args.id_col)
        write_tiles(payload, os.path.join(args.output, "tiles"), args.zoom)

    if args.mbtiles:
        from mapsplit_spark.sinks.mbtiles import export_mbtiles

        export_mbtiles(spark, manifests, args.mbtiles, args.zoom)

    if args.raster_mbtiles:
        from mapsplit_spark.operators.multimodal import tile_mosaics
        from mapsplit_spark.sinks.mbtiles import export_raster_mbtiles

        tile_imgs = pairs.join(
            src.select(args.id_col, "bytes"), pairs["element_id"] == src[args.id_col]
        ).select("tile_x", "tile_y", F.col("element_id").alias("image_id"), "bytes")
        export_raster_mbtiles(spark, tile_mosaics(tile_imgs), args.raster_mbtiles, args.zoom)

    m = spark.read.parquet(os.path.join(args.output, "manifests"))
    print(json.dumps({
        "tiles": m.count(),
        "elements": m.agg(F.sum("n")).collect()[0][0],
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
