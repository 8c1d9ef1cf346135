"""§2.5 — hierarchical tile merge ("optimize" pass, -O nodeLimit).

Reference: optimize()/getCounts/mapToNewTile (MapSplit.java:858-989) —
base-zoom tiles with fewer than nodeLimit elements are merged into
coarser-zoom parents: walking zoom-out levels d = 1..4
(MAX_ZOOM_OUT_DIFF = 5), accept the first 2^d×2^d sibling block whose
total lands in (nodeLimit, 4·nodeLimit) — or the deepest level tried —
backing off to the PREVIOUS level's zoom when the total reaches
≥ 4·nodeLimit (zoomMap.put(prevResult.keys[i], newZoom + 1) with
newZoom = zoom − z, i.e. zoom − (z−1) — MapSplit.java:908-912).
Iteration is over tiles in ascending packed-key order and
already-merged tiles are skipped.

Scale design: the walk looks order-dependent/sequential, but it
decomposes exactly by level-4 superblock — a tile's walk reads only
block sums at levels d ≤ 4 (all inside its own (x>>4, y>>4) block,
getCounts :952-976) and marks only tiles inside that block, so tiles in
different superblocks never interact and within-block ascending order
equals global ascending order restricted to the block.  The distributed
path therefore runs the identical pure-Python walk per superblock group
via applyInPandas (each group ≤ 256 tiles) — no full-histogram driver
collect; only the (small) merged-tile remap is joined back.  The
driver-side path (collect + one walk) remains for tiny inputs and as
the differential-test mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ZOOM_OUT_DIFF = 5  # MapSplit.java:80
_SUPER_SHIFT = MAX_ZOOM_OUT_DIFF - 1  # deepest walk level ⇒ superblock side 2^4


def compute_zoom_map(counts: dict[tuple[int, int], int], zoom: int,
                     node_limit: int) -> dict[tuple[int, int], int]:
    """counts: {(x, y): n} at base zoom → {(x, y): new_zoom} for merged
    tiles.  Pure-Python mirror of MapSplit.java:858-936; also used by
    the pytest oracle and the tile_merge gate's DuckDB-side remap."""
    if node_limit <= 0:
        return {}
    # r6: precompute per-level block membership + totals in O(n·levels)
    # — the previous per-tile sibling enumeration probed up to
    # 4+16+64+256 = 340 candidate coords per visited tile (z13 inputs
    # are sparse, so nearly every probe missed; measured as the dominant
    # cost of the distributed walk).  Build order follows the ascending
    # packed-key visit order, so each block's member list is already
    # sorted the way the walk reads it.  Semantics unchanged.
    keys_sorted = sorted(counts, key=lambda t: (t[0] << 16) | t[1])
    members: list[dict] = [None] * MAX_ZOOM_OUT_DIFF  # type: ignore[list-item]
    totals: list[dict] = [None] * MAX_ZOOM_OUT_DIFF  # type: ignore[list-item]
    for d in range(1, MAX_ZOOM_OUT_DIFF):
        mem: dict[tuple[int, int], list] = {}
        tot: dict[tuple[int, int], int] = {}
        for key in keys_sorted:
            bk = (key[0] >> d, key[1] >> d)
            if bk in mem:
                mem[bk].append(key)
                tot[bk] += counts[key]
            else:
                mem[bk] = [key]
                tot[bk] = counts[key]
        members[d] = mem
        totals[d] = tot
    zoom_map: dict[tuple[int, int], int] = {}
    for key in keys_sorted:
        if key in zoom_map or counts[key] >= node_limit:
            continue
        prev_block = None
        prev_zoom = None
        for d in range(1, MAX_ZOOM_OUT_DIFF):
            new_zoom = zoom - d
            bk = (key[0] >> d, key[1] >> d)
            block = members[d][bk]
            total = totals[d][bk]
            if total < 4 * node_limit:
                if total > node_limit or d == MAX_ZOOM_OUT_DIFF - 1:
                    for t in block:
                        zoom_map[t] = new_zoom
                    break
                prev_block, prev_zoom = block, new_zoom
            else:
                # back off to the PREVIOUS level's zoom: the reference
                # stores newZoom + 1 = zoom − (d−1) = prev_zoom
                # (MapSplit.java:908-912)
                if prev_block is not None:
                    for t in prev_block:
                        zoom_map[t] = prev_zoom
                break
    return zoom_map


def zoom_map_df(counts: DataFrame, zoom: int, node_limit: int,
                n_buckets: int = 256) -> DataFrame:
    """Distributed merge walk: counts(tile_x, tile_y, n) →
    (mx, my, new_zoom) for merged tiles only.

    Superblocks ((x>>4, y>>4) blocks) are independent, so the walk
    shards perfectly — but one applyInPandas GROUP per superblock pays
    ~1 ms of Arrow/pandas overhead × millions of superblocks at planet
    scale.  Instead superblocks hash into ``n_buckets`` groups (one
    Python call each, superblocks co-located by construction) and each
    call walks its superblocks locally: singleton superblocks take a
    vectorized shortcut (an under-limit tile alone in its level-4 block
    always merges at the deepest level, zoom−4 — the walk never finds a
    sibling), the rest run the identical pure-Python walk.  Bit-equal to
    the global driver walk; no driver collect.
    """
    import pandas as pd

    deepest = zoom - (MAX_ZOOM_OUT_DIFF - 1)

    def walk_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        sizes = pdf.groupby(["sbx", "sby"])["n"].transform("size")
        single = pdf[sizes == 1]
        merged = single[single["n"] < node_limit]
        out_x = merged["tile_x"].tolist()
        out_y = merged["tile_y"].tolist()
        out_z = [deepest] * len(out_x)
        multi = pdf[sizes > 1]
        for _, g in multi.groupby(["sbx", "sby"], sort=False):
            stats = dict(zip(zip(g["tile_x"], g["tile_y"]), g["n"]))
            for (x, y), z in compute_zoom_map(stats, zoom, node_limit).items():
                out_x.append(x)
                out_y.append(y)
                out_z.append(z)
        return pd.DataFrame({
            "mx": pd.Series(out_x, dtype="int64"),
            "my": pd.Series(out_y, dtype="int64"),
            "new_zoom": pd.Series(out_z, dtype="int32"),
        })

    bucketed = counts.withColumns({
        "sbx": F.shiftright("tile_x", _SUPER_SHIFT),
        "sby": F.shiftright("tile_y", _SUPER_SHIFT),
    }).withColumn("bucket", F.pmod(F.xxhash64("sbx", "sby"), F.lit(n_buckets)))
    # the walk is Python-CPU-heavy but byte-light: AQE's byte-sized
    # coalescing squeezed it into ~3 tasks (measured 6 s of 17 s CPU at
    # sf0.1).  An EXPLICIT repartition on the group key is exempt from
    # AQE coalescing and the groupBy below reuses its partitioning, so
    # the walk runs core-wide at any scale (r6, guide §2.5).
    n_part = min(n_buckets,
                 counts.sparkSession.sparkContext.defaultParallelism)
    bucketed = bucketed.repartition(n_part, "bucket")
    return bucketed.groupBy("bucket").applyInPandas(
        lambda key, pdf: walk_bucket(pdf),
        "mx long, my long, new_zoom int",
    )


def merged_assignments(assignments: DataFrame, zoom: int, node_limit: int,
                       counts: DataFrame | None = None,
                       distributed: bool = True) -> DataFrame:
    """Re-key exploded (element_id, tile_x, tile_y) through the merge map.

    → (element_id, zoom, tile_x, tile_y) distinct — merged tiles carry
    their coarser zoom and right-shifted coordinates
    (mapToNewTile, MapSplit.java:985-989).
    """
    spark = assignments.sparkSession
    if counts is None:
        counts = assignments.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n"))
    if node_limit <= 0:
        zmap_df = None
    elif distributed:
        # merged subset ≪ histogram; broadcast keeps the remap join
        # shuffle-free (falls back to shuffle join above the 8 GB
        # broadcast cap — then partitioned on the same tile key)
        # an empty map degenerates to a no-op left join — no pre-check
        # (isEmpty would execute the walk twice)
        zmap_df = F.broadcast(zoom_map_df(counts, zoom, node_limit))
    else:
        stats = {(r.tile_x, r.tile_y): r.n for r in counts.collect()}
        zmap = compute_zoom_map(stats, zoom, node_limit)
        zmap_df = F.broadcast(spark.createDataFrame(
            [(x, y, z) for (x, y), z in zmap.items()],
            "mx long, my long, new_zoom int",
        )) if zmap else None
    if zmap_df is None:
        return assignments.select(
            "element_id", F.lit(zoom).alias("zoom"), "tile_x", "tile_y"
        ).dropDuplicates(["element_id", "tile_x", "tile_y"])
    joined = assignments.join(
        zmap_df,
        (assignments.tile_x == zmap_df.mx) & (assignments.tile_y == zmap_df.my),
        "left",
    )
    shift = F.lit(zoom) - F.col("new_zoom")
    return (
        joined.select(
            "element_id",
            F.coalesce(F.col("new_zoom"), F.lit(zoom)).alias("zoom"),
            F.when(
                F.col("new_zoom").isNotNull(),
                (F.col("tile_x") / F.pow(F.lit(2.0), shift)).cast("long"),
            ).otherwise(F.col("tile_x")).alias("tile_x_new"),
            F.when(
                F.col("new_zoom").isNotNull(),
                (F.col("tile_y") / F.pow(F.lit(2.0), shift)).cast("long"),
            ).otherwise(F.col("tile_y")).alias("tile_y_new"),
        )
        .select(
            "element_id", "zoom",
            F.col("tile_x_new").alias("tile_x"),
            F.col("tile_y_new").alias("tile_y"),
        )
        .dropDuplicates(["element_id", "zoom", "tile_x", "tile_y"])
    )
