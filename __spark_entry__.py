"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
training-data engine addition) run over the driver's parquet tables;
``oracle_sql()`` returns the equivalent DuckDB SQL.  Tile-math formulas
are generated ONCE by ``mapsplit_spark.sqlgen`` and used verbatim by
both engines, so engine/oracle float parity holds by construction.

The tables carry no coordinates, so each query derives a deterministic
(lon, lat) from the integer key via integer-arithmetic SQL
(sqlgen.derived_lon_sql/derived_lat_sql) — identical in both engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapsplit_spark import sqlgen  # noqa: E402
from mapsplit_spark.operators.assign import (  # noqa: E402
    assign_and_expand,
    assign_tiles,
)
from mapsplit_spark.operators.knn import knn_bruteforce, knn_tiled  # noqa: E402
from mapsplit_spark.operators.propagate import (  # noqa: E402
    backfill_member_tiles,
    way_tiles,
)
from mapsplit_spark.operators.similarity import cosine_topk  # noqa: E402
from mapsplit_spark.operators import geometry, textstats  # noqa: E402
from mapsplit_spark.sinks.manifests import tile_counts, tile_manifests  # noqa: E402

ZOOM = 13
BORDER = 0.1
WATERMARK = "2024-01-20 00:00:00"
EMB_DIM = 64
CLUSTER_ZOOM = 5
CLUSTER_DENOM = 2000  # min_pts = max(2, n_events // 2000) — SF-relative
CMS_DEPTH = 4

# derived geo keys (integer arithmetic — portable & exact)
EV_LON = sqlgen.derived_lon_sql("event_id")
EV_LAT = sqlgen.derived_lat_sql("event_id")
LI_KEY = "(l_orderkey * 8 + l_linenumber)"
NID = f"({LI_KEY} % 12000)"  # some ids miss the events table → drop semantics


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # defensive reset: q_emb_near_dup leaves wholeStage=false as a
    # deliberate per-gate hint (see its docstring); every gate callable
    # reads a table first, so the next gate always restores the default
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ev_us(col) -> F.Column:
    """Naive epoch-microseconds of an events timestamp (TIMESTAMP_NTZ
    from pyarrow parquet) ≡ DuckDB epoch_us on its naive TIMESTAMP —
    timezone-free on both sides.  See operators/temporal.py:_micros."""
    import datetime

    epoch = F.lit(datetime.datetime(1970, 1, 1)).cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, F.col(col) if isinstance(col, str) else col)


def _event_points(spark, sf_dir) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr(EV_LON).alias("lon"),
        F.expr(EV_LAT).alias("lat"),
    )


def _event_pairs(spark, sf_dir) -> DataFrame:
    return assign_and_expand(_event_points(spark, sf_dir), "event_id", "lon", "lat", ZOOM, BORDER)


def _li_members(spark, sf_dir, offset: int = 0) -> DataFrame:
    """lineitem way-membership edges, widened: the single-file fixture
    scan yields ~3 partitions and every downstream join + collect_set
    aggregate inherits them (the way_tiles partial agg measured 2 s on
    3 tasks; none/8/16/32-width A/B read 1.7-4.2/1.4-2.0/1.4-1.6/
    1.5-1.8 s).  Same artifact-or-no-op reasoning as the doc_winnow
    repartition: at real scale the input is many files and this is a
    no-op in spirit (r6)."""
    edges = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") + offset).alias("way_id"),
        F.expr(NID).alias("member_id"),
    )
    return edges.repartition(max(8, spark.sparkContext.defaultParallelism // 2))


def _events_nodes_cte() -> str:
    assign = sqlgen.assign_cte_sql(
        "(SELECT event_id, " + EV_LON + " AS lon, " + EV_LAT + " AS lat FROM events) ev",
        "event_id", "lon", "lat", ZOOM, BORDER,
    )
    return sqlgen.expand_union_sql(assign)


# ---------------------------------------------------------------- queries

def q_tile_assign(spark, sf_dir):
    """P1 — base-tile projection with clamping (MapSplit.java:194-221)."""
    return assign_tiles(_event_points(spark, sf_dir), "event_id", "lon", "lat", ZOOM).select(
        "element_id", "tile_x", "tile_y"
    )


def q_tile_assign_border(spark, sf_dir):
    """P2 — border/neighbour expansion (MapSplit.java:411-445)."""
    return _event_pairs(spark, sf_dir)


def q_tile_counts(spark, sf_dir):
    """A2 — per-tile membership histogram (MapSplit.java:867-883)."""
    return tile_counts(_event_pairs(spark, sf_dir))


def q_tile_manifest(spark, sf_dir):
    """S6 golden manifests — sorted id list per tile (joined as string
    for portable value-hash comparison)."""
    m = tile_manifests(_event_pairs(spark, sf_dir), ZOOM, assume_distinct=True)
    return m.select(
        "zoom", "tile_x", "tile_y",
        F.concat_ws(",", F.col("element_ids")).alias("ids"),
        "n",
    )


def q_modified_tiles(spark, sf_dir):
    """P3/A4 — incremental: tiles touched by elements newer than the
    appointment date (MapSplit.java:435-437, 391-402)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts") > F.lit(WATERMARK)).select(
        "event_id", F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat")
    )
    return (
        assign_and_expand(ev, "event_id", "lon", "lat", ZOOM, BORDER)
        .select("tile_x", "tile_y").distinct()
    )


def q_latest_ts(spark, sf_dir):
    """A3 — running max timestamp (MapSplit.java:440-442)."""
    return _t(spark, sf_dir, "events").agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        F.count("*").alias("n_events"),
    )


def q_bounds_union(spark, sf_dir):
    """A6 — bounds union for output metadata (MapSplit.java:1283-1290)."""
    return _event_points(spark, sf_dir).agg(
        F.round(F.min("lon"), 6).alias("min_lon"),
        F.round(F.max("lon"), 6).alias("max_lon"),
        F.round(F.min("lat"), 6).alias("min_lat"),
        F.round(F.max("lat"), 6).alias("max_lat"),
    )


def q_session_tiles(spark, sf_dir):
    """J1 + P5 — way tile-set union with drop-if-any-member-missing
    (MapSplit.java:452-511).  Ways ≡ lineitem groups per orderkey,
    member nodes ≡ events rows."""
    members = _li_members(spark, sf_dir)
    return way_tiles(members, _event_pairs(spark, sf_dir), "way_id", "member_id")


def q_node_backfill(spark, sf_dir):
    """J2 — members inherit their way's full tile set
    (MapSplit.java:506-510); union with the nodes' own tiles."""
    # NOT _li_members: members feeds three consumers here (way_tiles,
    # the ok-ways semi-join, the backfill join) and each would re-run
    # the widening shuffle — A/B'd slower (3.1 vs 2.7 s warm)
    members = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("way_id"), F.expr(NID).alias("member_id")
    )
    # reused subtrees are materialized once — Spark does not reuse
    # non-identical exchanges across branches, and at scale the
    # assignment relation is the expensive side (the pipeline
    # materializes it as a stage for the same reason).  localCheckpoint
    # instead of persist: blocks are context-cleaned on GC, so repeated
    # queries() use doesn't accumulate pinned cache entries.
    node_tiles = _event_pairs(spark, sf_dir).localCheckpoint(eager=True)
    wt = way_tiles(members, node_tiles, "way_id", "member_id").localCheckpoint(eager=True)
    ok_members = members.join(
        wt.select("way_id").distinct(), "way_id"
    )
    return backfill_member_tiles(ok_members, wt, node_tiles, "way_id", "member_id")


def q_knn(spark, sf_dir):
    """kNN lookup (north-star addition): 5 query points, top-5 events by
    exact haversine, deterministic ties."""
    qk = "(n_nationkey * 37 + 11)"
    queries = _t(spark, sf_dir, "nation").filter("n_nationkey < 5").select(
        F.col("n_nationkey").cast("long").alias("query_id"),
        F.expr(sqlgen.derived_lon_sql(qk)).alias("q_lon"),
        F.expr(sqlgen.derived_lat_sql(qk)).alias("q_lat"),
    )
    points = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("point_id"),
        F.expr(EV_LON).alias("p_lon"),
        F.expr(EV_LAT).alias("p_lat"),
    )
    return knn_bruteforce(queries, points, k=5).withColumnRenamed("rank", "rnk")


def _knn_inputs(spark, sf_dir):
    qk = "(n_nationkey * 37 + 11)"
    queries = _t(spark, sf_dir, "nation").filter("n_nationkey < 5").select(
        F.col("n_nationkey").cast("long").alias("query_id"),
        F.expr(sqlgen.derived_lon_sql(qk)).alias("q_lon"),
        F.expr(sqlgen.derived_lat_sql(qk)).alias("q_lat"),
    )
    points = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("point_id"),
        F.expr(EV_LON).alias("p_lon"),
        F.expr(EV_LAT).alias("p_lat"),
    )
    return queries, points


def q_knn_tiled(spark, sf_dir):
    """kNN scale path: tile-ring (H3 k-ring analog) candidate generation
    + exact haversine re-rank.  At z4/ring2 the ring half-width
    (~2500 km) provably exceeds the 5th-neighbour distance at this
    density, so the result equals exact brute force — the oracle is the
    same exact-kNN SQL."""
    queries, points = _knn_inputs(spark, sf_dir)
    return knn_tiled(queries, points, zoom=4, ring=2, k=5).withColumnRenamed("rank", "rnk")


def q_tile_bounds(spark, sf_dir):
    """Bordered tile bbox (getBound, MapSplit.java:230-246): per distinct
    modified tile, the border-expanded bbox clamped to world bounds —
    the Bound row each tile file starts with (S6)."""
    # same repartition rationale as q_tile_cellid: four bordered-bbox
    # trig expressions per row above a byte-light distinct
    tiles = _event_pairs(spark, sf_dir).select("tile_x", "tile_y").distinct() \
        .repartition(spark.sparkContext.defaultParallelism, "tile_x", "tile_y")
    l = sqlgen.tile2lon_sql("tile_x", ZOOM)
    r = sqlgen.tile2lon_sql("tile_x + 1", ZOOM)
    t = sqlgen.tile2lat_sql("tile_y", ZOOM)
    b = sqlgen.tile2lat_sql("tile_y + 1", ZOOM)
    return tiles.select(
        "tile_x", "tile_y",
        F.round(F.expr(f"GREATEST({l} - {BORDER!r} * ({r} - {l}), -180.0)"), 9).alias("b_left"),
        F.round(F.expr(f"LEAST({r} + {BORDER!r} * ({r} - {l}), 180.0)"), 9).alias("b_right"),
        F.round(F.expr(f"LEAST({t} - {BORDER!r} * ({b} - {t}), 85.0511)"), 9).alias("b_top"),
        F.round(F.expr(f"GREATEST({b} + {BORDER!r} * ({b} - {t}), -85.0511)"), 9).alias("b_bottom"),
    )


# CCW convex quadrilateral used by the oracle-checked clip query
CLIP_QUAD = [(-50.0, -30.0), (40.0, -40.0), (60.0, 25.0), (-30.0, 35.0)]

# concave outer ring + hole for the general even-odd clip gate (P7/P8/P9
# general form).  No horizontal edges (ring_pip_sql requirement) and no
# vertex near a tile-corner grid line.
CLIP_RING = [
    (-60.0, -50.0), (20.0, -55.3), (25.7, -10.2), (-10.3, -15.1),
    (-12.7, 20.4), (30.1, 15.2), (35.0, 55.7), (-55.2, 60.3),
]
CLIP_HOLE = [(-30.0, -30.0), (-20.0, -38.5), (-40.0, -35.2)]

# relation namespaces for the J3-J6 gates: relation/way ids must not
# collide with event (node) ids — offset into disjoint ranges
R1, R2, R3 = 1_000_000, 2_000_000, 3_000_000
REL_CUST_LIMIT = 20  # complete-relations gate: bounded relation subset


def q_clip_convex(spark, sf_dir):
    """P7/P9 — point-in-polygon clip (convex half-plane form so the
    oracle is pure SQL; general rings are pytest-verified in
    operators/clip.py)."""
    inside = _event_points(spark, sf_dir).filter(
        F.expr(sqlgen.convex_pip_sql("lon", "lat", CLIP_QUAD))
    )
    return assign_tiles(inside, "event_id", "lon", "lat", ZOOM).select(
        "element_id", "tile_x", "tile_y"
    )


def q_tile_merge(spark, sf_dir):
    """§2.5 optimize — hierarchical tile merge (MapSplit.java:858-936),
    distributed superblock walk.  Full value-hash gate: the oracle embeds
    the shared pure-Python walk's remap (computed from DuckDB-side
    counts) as a VALUES table."""
    from mapsplit_spark.operators.optimize import merged_assignments

    merged = merged_assignments(_event_pairs(spark, sf_dir), ZOOM, node_limit=5)
    return (
        merged.groupBy("zoom", "tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
    )


def q_clip_ring(spark, sf_dir):
    """P7 general even-odd rings + P8 tile corner test + P9/J8 tile clip
    join — the reference's clipPoly path (MapSplit.java:999-1065,
    1128-1145) with a concave outer ring and a hole, run through the
    real numpy clip operators (operators/clip.py)."""
    import numpy as np

    from mapsplit_spark.operators.clip import clip_assignments, clip_tiles

    def ring_np(vs):
        r = np.array(vs, dtype=np.float64)
        return (r, (r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()))

    pairs = _event_pairs(spark, sf_dir)
    kept = clip_tiles(
        pairs.select("tile_x", "tile_y").distinct(),
        [ring_np(CLIP_RING)], [ring_np(CLIP_HOLE)], ZOOM,
    )
    return clip_assignments(pairs, kept)


def _relation_edges(spark, sf_dir):
    """Three-level relation nesting over disjoint id namespaces:
    level-1 relations (R1+orderkey) contain event nodes, level-2
    (R2+custkey) contain level-1 relations, level-3 (R3+nationkey)
    contain level-2 — J3 member lookups + the J4 fixed point resolve
    the chain (postProcessRelations, MapSplit.java:772-790)."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") + R1).alias("relation_id"),
        F.expr(NID).alias("member_id"),
    )
    od = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") + R2).alias("relation_id"),
        (F.col("o_orderkey") + R1).alias("member_id"),
    )
    cu = _t(spark, sf_dir, "customer").select(
        (F.col("c_nationkey") + R3).alias("relation_id"),
        (F.col("c_custkey") + R2).alias("member_id"),
    )
    return li.unionByName(od).unionByName(cu)


def q_relation_tiles(spark, sf_dir):
    """J3/J4 — relation member tile lookups with relation→relation
    forward refs resolved to fixed point (MapSplit.java:547-622,
    772-790); missing members skipped, empty relations dropped (P5)."""
    from mapsplit_spark.operators.propagate import relation_tiles_fixed_point

    return relation_tiles_fixed_point(
        _relation_edges(spark, sf_dir), _event_pairs(spark, sf_dir)
    )


def q_complete_rel(spark, sf_dir):
    """J5/J6 — complete-relations down-propagation (-c/-C): members
    inherit the relation's full tile set (MapSplit.java:641-661) and
    nodes of member ways inherit those ways' augmented sets in pass 2
    (addExtraWayToMap, MapSplit.java:519-527, 793-831)."""
    from mapsplit_spark.operators.propagate import (
        complete_relation_propagation,
        way_tiles,
    )

    node_tiles = _event_pairs(spark, sf_dir)
    # plain members: consumed by way_tiles AND the pass-2 way_aug join
    # (the widening shuffle would run per consumer — the node_backfill
    # finding)
    way_members = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") + R1).alias("way_id"), F.expr(NID).alias("member_id")
    )
    wt = way_tiles(way_members, node_tiles, "way_id", "member_id")
    rel_members = _t(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < REL_CUST_LIMIT
    ).select(
        (F.col("o_custkey") + R2).alias("relation_id"),
        (F.col("o_orderkey") + R1).alias("member_id"),
    )
    rel_tiles = (
        rel_members.join(wt, rel_members.member_id == wt.way_id)
        .select(F.col("relation_id").alias("element_id"), "tile_x", "tile_y")
        .distinct()
    )
    return complete_relation_propagation(rel_members, rel_tiles, way_members, node_tiles)


def q_complete_rel_mp(spark, sf_dir):
    """P6 — multipolygon tag predicate (-C): complete-relations
    down-propagation restricted to relations tagged type=multipolygon
    (MapSplit.java:641, 672-674; SplitTest.java:91-103), run through the
    PRODUCTION sessions operator (sessions.session_assignments with
    multipolygon_only=True) over a sessions table assembled in-query:
    ways ≡ lineitem groups, collections ≡ bounded orders groups tagged
    multipolygon iff o_custkey is even.  Odd-custkey collections still
    resolve their own tiles (J3) but their members inherit NOTHING —
    the restriction is what the value hash pins.  Hole fill is disabled
    (holefill_min=None) to keep the oracle SQL-expressible; fill
    semantics have their own gate (session_holefill)."""
    from mapsplit_spark.operators.sessions import session_assignments

    # NOT widened: the collect_list groupBy shuffles the relation anyway,
    # so a pre-repartition is a pure extra exchange (A/B'd: +1 s)
    li = _t(spark, sf_dir, "lineitem")
    ways = (
        li.groupBy((F.col("l_orderkey") + R1).alias("session_id"))
        .agg(F.collect_list(F.expr(NID)).alias("member_ids"))
        .select(
            "session_id", F.lit("session").alias("kind"), "member_ids",
            F.lit(None).cast("map<string,string>").alias("tags"),
        )
    )
    cols = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < REL_CUST_LIMIT)
        .groupBy((F.col("o_custkey") + R2).alias("session_id"))
        .agg(F.collect_list(F.col("o_orderkey") + R1).alias("member_ids"))
        .select(
            "session_id", F.lit("collection").alias("kind"), "member_ids",
            F.create_map(
                F.lit("type"),
                F.when((F.col("session_id") - R2) % 2 == 0, F.lit("multipolygon"))
                .otherwise(F.lit("route")),
            ).alias("tags"),
        )
    )
    return session_assignments(
        _event_pairs(spark, sf_dir), ways.unionByName(cols),
        complete=True, multipolygon_only=True, holefill_min=None,
    )


def q_mbtiles_rows(spark, sf_dir):
    """S7 — MBTiles tile-row construction: TMS y-flip
    (MapSplit.java:1359-1364) + manifest JSON blob, as the exact relation
    ``export_mbtiles`` writes to SQLite."""
    from mapsplit_spark.sinks.mbtiles import mbtiles_tile_rows

    man = tile_manifests(_event_pairs(spark, sf_dir), ZOOM, assume_distinct=True)
    return mbtiles_tile_rows(man, ZOOM)


def q_lsh_near_dup(spark, sf_dir):
    """MinHash-LSH near-dup SCALE path, oracle-checked end-to-end: band
    bucket join (capped) + exact Jaccard verify at θ=0.9.  The fixture's
    planted near-dups sit at s ≥ 0.96 where the 16-band/2-row curve has
    miss probability (1−s²)^16 < 1e-17, so LSH recall is 1.0 and the
    exact-Jaccard SQL is a valid oracle (same construction as the
    knn_tiled↔exact-kNN gate)."""
    from mapsplit_spark.operators.dedup import minhash_near_dups

    # repartition the single-file fixture read so the shingle+minhash
    # expression pass runs wide (same artifact as q_doc_winnow)
    return minhash_near_dups(
        _t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        ),
        ngram=3, num_hashes=32, bands=16, threshold=0.9,
    )


def q_phash_near_dup(spark, sf_dir):
    """pHash Hamming near-dup — the image-corpus dedup path over the
    input_hint ``phash:int64`` column shape: pigeonhole multi-index band
    join (4×15-bit bands; radius 3 ≤ bands−1 makes recall EXACT, not
    probabilistic) + one XOR/popcount verify per colliding pair.
    Hashes derive deterministically from doc_id with planted bit-flips
    straddling the radius boundary (distances 1,1,2,3,3 in, 4 out —
    sqlgen.derived_phash_band_sql).  The oracle is an INDEPENDENT
    brute-force all-pairs arithmetic-popcount formulation, so the
    operator's shiftright/mask banding, the bigint packing, and
    bit_count(xor) are gated against FLOOR/mod bit arithmetic — the
    tile_cellid two-formulations pattern."""
    from mapsplit_spark.operators.dedup import hamming_near_dups

    bands = [sqlgen.derived_phash_band_sql("doc_id", k) for k in range(4)]
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(sqlgen.phash_from_bands_sql(bands)).alias("phash"),
    )
    return hamming_near_dups(
        docs, id_col="doc_id", hash_col="phash", radius=3, n_bands=4, bits=60
    )


def q_dup_components(spark, sf_dir):
    """Near-dup GROUP resolution: the pHash pair relation (exact
    pigeonhole band join above) closed under transitivity by the
    distributed min-label/pointer-jumping connected-components operator
    — the step that turns pairs into 'keep one representative per dup
    cluster' semantics.  Oracle: DuckDB WITH RECURSIVE reachability over
    the independent brute-force pair derivation, so the iterative Spark
    fixpoint is checked against a declarative transitive closure."""
    from mapsplit_spark.operators.components import connected_components

    comp = connected_components(q_phash_near_dup(spark, sf_dir))
    return comp.select(F.col("v").alias("doc_id"), "component")


def q_doc_dedup_keep(spark, sf_dir):
    """Corpus reduction after group resolution: drop every non-
    representative member (component min survives, untouched docs
    survive) — |kept| = |docs| − Σ(|group|−1)."""
    from mapsplit_spark.operators.dedup import hamming_near_dups
    from mapsplit_spark.operators.components import dedup_keep

    bands = [sqlgen.derived_phash_band_sql("doc_id", k) for k in range(4)]
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(sqlgen.phash_from_bands_sql(bands)).alias("phash"),
    )
    pairs = hamming_near_dups(
        docs, id_col="doc_id", hash_col="phash", radius=3, n_bands=4, bits=60
    )
    return dedup_keep(docs, pairs).select("doc_id")


def q_tile_cellid(spark, sf_dir):
    """Cell encodings (H3/S2-analog quadtree ids): per distinct tile,
    the Morton Z-order index via the ENGINE's shift/mask column kernel
    (cellid.morton_col) — gated against an INDEPENDENT arithmetic
    formulation in the oracle — plus the Bing quadkey string (shared
    sqlgen text, parity by construction)."""
    from mapsplit_spark.cellid import morton_col

    # explicit repartition between the byte-light distinct and the
    # expensive per-row quadkey string kernel: AQE's byte-sized
    # coalescing otherwise runs the 13-level string concat on 1-3 tasks
    # (measured 2× on this gate; exempt-from-coalescing repartition,
    # r6 guide §2.5)
    tiles = _event_pairs(spark, sf_dir).select("tile_x", "tile_y").distinct() \
        .repartition(spark.sparkContext.defaultParallelism, "tile_x", "tile_y")
    return tiles.select(
        "tile_x", "tile_y",
        morton_col(F.col("tile_x"), F.col("tile_y")).alias("morton"),
        F.expr(sqlgen.quadkey_sql("tile_x", "tile_y", ZOOM)).alias("quadkey"),
    )


# §2.6 gate fixture: three ring-shaped groups appended to the session
# tile relation so the gate EXERCISES an actual fill (the driver
# fixture's scattered sessions enclose nothing on their own).  Disjoint
# way_id namespace; expected holes below are the checkAndFill result
# (verified against oracle.hole_fill and the hypothesis property suite):
#   A: 3×3 rectangle ring  → encloses the 1 center tile
#   B: 5×5 rectangle ring  → encloses the inner 3×3 (9 tiles, and the
#      compressed-grid fill must expand a >1-cell rectangle)
#   C: radius-2 manhattan diamond → encloses the 5-tile plus shape
#      (non-rectangular enclosure)
RING_GROUPS = {
    9_000_001: sorted({(1000 + dx, 2000 + dy) for dx in range(3) for dy in range(3)}
                      - {(1001, 2001)}),
    9_000_002: sorted({(3000 + dx, 4000) for dx in range(5)}
                      | {(3000 + dx, 4004) for dx in range(5)}
                      | {(3000, 4000 + dy) for dy in range(5)}
                      | {(3004, 4000 + dy) for dy in range(5)}),
    9_000_003: sorted({(5000 + dx, 6000 + dy) for dx in range(-2, 3)
                       for dy in range(-2, 3) if abs(dx) + abs(dy) == 2}),
}
RING_HOLES = {
    9_000_001: [(1001, 2001)],
    9_000_002: [(3000 + dx, 4000 + dy) for dx in (1, 2, 3) for dy in (1, 2, 3)],
    9_000_003: [(4999, 6000), (5000, 5999), (5000, 6000), (5000, 6001), (5001, 6000)],
}


def q_session_holefill(spark, sf_dir):
    """§2.6 hole-fill over session tile sets.  The flood fill itself is
    not SQL-expressible, but its RESULT on a fixed fixture is: the ring
    groups above have deterministic hole sets, embedded in the oracle as
    a VALUES table (same trick as tile_merge) — so this is a full
    value-hash gate whose spark_rows EXCEED the plain session union."""
    from mapsplit_spark.operators.holefill import fill_holes

    rows = [(gid, x, y) for gid, tiles in RING_GROUPS.items() for x, y in tiles]
    rings = spark.createDataFrame(rows, "group_id long, tile_x long, tile_y long")
    # the way_tiles subtree (join + collect_set aggregate + explode) is
    # the expensive upstream and fill_holes consumes it three times
    # (count gate, candidate join, output union) — checkpoint it ONCE
    # (r6: the plan previously evaluated the ObjectHashAggregate subtree
    # 3×, ~2/3 of this gate's executor time).  Its output is distinct by
    # construction → assume_distinct skips the output dedup shuffle.
    wt = q_session_tiles(spark, sf_dir).withColumnRenamed("way_id", "group_id") \
        .localCheckpoint(eager=True)
    # ring ids are disjoint from session ids, so the two fills compose by
    # union — keeping the big session path's plan identical to the
    # fixture-free formulation (unioning BEFORE the fill inflated the
    # shuffle partitioning of all three src consumers, measured +60%)
    out = fill_holes(wt, assume_distinct=True).unionByName(
        fill_holes(rings, assume_distinct=True))
    return out.withColumnRenamed("group_id", "way_id")


def q_modified_tiles_sessions(spark, sf_dir):
    """S5 incremental over GROUPED entities (VERDICT r3 missing #1): a
    session/collection is modified iff ANY member is TRANSITIVELY newer
    than the appointment date, and then its WHOLE tile set is rewritten
    — the reference's entity-level modified marking
    (MapSplit.java:435-437) closed over membership.  Two levels (ways ≡
    lineitem groups, collections ≡ bounded orders groups of ways) so
    the gate exercises the closure's transitivity, not just one hop;
    runs the production ``propagate_newer`` fixed point.  Disjoint id
    namespaces (R1/R2) keep group ids from colliding with event ids in
    the shared closure id space."""
    from mapsplit_spark.operators.propagate import propagate_newer, way_tiles

    newer = _t(spark, sf_dir, "events").filter(
        F.col("ts") > F.lit(WATERMARK)
    ).select(F.col("event_id").alias("element_id"))
    # NOT _li_members: members feeds way_tiles AND the closure edge set —
    # the widening shuffle would run twice (A/B'd slower, 3.1 vs 2.5 s)
    members = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") + R1).alias("way_id"), F.expr(NID).alias("member_id")
    )
    node_tiles = _event_pairs(spark, sf_dir)
    wt = way_tiles(members, node_tiles, "way_id", "member_id") \
        .localCheckpoint(eager=True)  # feeds collection tiles + output
    cols = _t(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < REL_CUST_LIMIT
    ).select(
        (F.col("o_custkey") + R2).alias("col_id"),
        (F.col("o_orderkey") + R1).alias("member_id"),
    )
    col_tiles = (
        cols.join(wt, cols.member_id == wt.way_id)
        .select(F.col("col_id").alias("element_id"), "tile_x", "tile_y")
        .distinct()
    )
    edges = members.select(
        F.col("way_id").alias("group_id"), "member_id"
    ).unionByName(cols.select(F.col("col_id").alias("group_id"), "member_id"))
    closed = propagate_newer(edges, newer)
    group_tiles = wt.select(
        F.col("way_id").alias("element_id"), "tile_x", "tile_y"
    ).unionByName(col_tiles)
    # no broadcast hint: the newer-closure can be delta-sized or
    # corpus-sized depending on the watermark — let AQE decide
    return group_tiles.join(closed, "element_id", "left_semi")


PYRAMID_MIN_ZOOM = 9  # 5 pyramid levels in the gate (13 → 9)


def q_tile_pyramid(spark, sf_dir):
    """Pyramid rollup (engine addition, r4): per-tile DISTINCT-element
    counts at every zoom in [9, 13] from the bordered base assignment —
    one map-side level fan-out + one dedupe + one aggregation (two
    shuffles at any depth); oracle = per-level FLOOR-division GROUP BYs
    unioned (portable integer arithmetic)."""
    from mapsplit_spark.operators.pyramid import pyramid_counts

    # widened: the 5-level map-side fan-out + partial dedupe otherwise
    # runs on the 1-2 single-file scan partitions (A/B none/8 →
    # 1.7-3.8/1.4-2.3 s)
    pts = _event_points(spark, sf_dir).repartition(
        max(8, spark.sparkContext.defaultParallelism // 4))
    pairs = assign_and_expand(pts, "event_id", "lon", "lat", ZOOM, BORDER)
    return pyramid_counts(pairs, ZOOM, PYRAMID_MIN_ZOOM, assume_distinct=True)


def q_doc_token_stats(spark, sf_dir):
    """Token counting (training-data op)."""
    return textstats.token_stats(_t(spark, sf_dir, "documents"))


def q_doc_quality(spark, sf_dir):
    """Quality scoring: stopword ratio + length heuristics."""
    return textstats.quality_score(_t(spark, sf_dir, "documents"))


def q_lang_profile(spark, sf_dir):
    """Corpus language/source profile."""
    return textstats.lang_source_profile(_t(spark, sf_dir, "documents"))


def q_doc_exact_dup(spark, sf_dir):
    """Exact dedup groups (hash-groupBy on raw text, n ≥ 2)."""
    from mapsplit_spark.operators.dedup import exact_dup_groups

    return exact_dup_groups(_t(spark, sf_dir, "documents"))


def q_doc_lang_id(spark, sf_dir):
    """Stopword-profile language-ID heuristic (rows-only gate; exactness
    covered by pytest on multilingual fixtures)."""
    return textstats.lang_id(_t(spark, sf_dir, "documents"))


def q_doc_winnow(spark, sf_dir):
    """Winnowing (rolling-window k-gram) document fingerprints — the
    local fingerprinting scheme (Schleimer et al. 2003); md5-string
    hashes keep the construction portable to the DuckDB oracle.

    The fixture table is ONE small parquet file → one input partition,
    which would serialize the whole md5-gram pass into a single task
    (measured 12 of 15 s at sf0.1); repartition first so the
    expression-heavy map runs wide.  At real scale the input is many
    files and this is a no-op in spirit."""
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return textstats.winnow_fingerprints(docs)


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting / bag-of-words dedup groups."""
    return textstats.fingerprint_dup_groups(_t(spark, sf_dir, "documents"))


def q_doc_jaccard_pairs(spark, sf_dir):
    """Exact trigram-Jaccard near-dup pairs (brute-force verification
    path — the LSH candidate-generation scale path is pytest-verified in
    operators/dedup.py; this oracle-checked variant proves the verify
    stage's math)."""
    # tokenize in its own projection — a split() captured inside the
    # shingle transform lambda would re-run per shingle (the doc_winnow
    # lambda-capture class; see operators/textstats.py)
    toked = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.split(F.trim(F.col("text")), r"\s+").alias("_tk"),
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("_tk") - 2, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(F.col("_tk"), i, 3)),
        )
    )
    s = toked.select(F.col("doc_id"), sh.alias("sh"))
    a = s.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(inter / uni, 6))
        .filter(F.col("jaccard") >= 0.12)
        .select("id_a", "id_b", "jaccard")
    )


def q_emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (training-data dedup op) —
    brute-force verification path; the LSH/IVF candidate generation is
    the pytest-verified scale path.  Codegen-safe form (r4): norms
    precomputed per SIDE, ONE dot per pair (HOF at dim 64 since r5's
    UNROLL_MAX_DIM=32); numerics are identical to the oracle's
    unrolled text.

    r5 (VERDICT r4 trivia): this labeled n² BNLJ gate runs with
    ``spark.sql.codegen.wholeStage=false`` — the interleaved A/B
    (tools/ab_dot_pair.py) measured 12.7 s vs 23.4 s (HOF) vs 40.5 s
    (unrolled) for this one shape, because BNLJ-condition evaluation
    of a big expression never JITs inside one whole-stage method.  The
    conf is left set when this callable returns (the collect happens
    driver-side after); every other gate restores the default via
    ``_t``.  Production similarity paths (LSH/IVF/windowed top-k) keep
    whole-stage codegen."""
    from mapsplit_spark.operators.similarity import dot_pair, norm_col

    emb = _t(spark, sf_dir, "embeddings")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                   norm_col(F.col("embedding")).alias("_na"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                   norm_col(F.col("embedding")).alias("_nb"))
    cos = dot_pair("va", "vb", EMB_DIM) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= 0.35)
        .select("id_a", "id_b", "cos_sim")
    )


def q_emb_ann_topk(spark, sf_dir):
    """IVF ANN machinery oracle-checked end-to-end in FULL-PROBE mode:
    cell assignment, multi-probe expansion, per-cell join, dedup and
    re-rank must reconstruct the exact top-k when every cell is probed —
    gating that the partitioned scale path neither loses nor duplicates
    candidates across cells.  This driver fixture's embeddings are
    near-random (max cosine ≈ 0.36), so no honest pruning has recall 1
    on it — GENUINE pruning is gated separately on derived clustered
    vectors (emb_ann_pruned) and its recall degradation is
    regression-tested in test_similarity_text."""
    from mapsplit_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec"))
    return ivf_topk(queries, corpus, EMB_DIM, k=3, n_clusters=16, n_probe=16) \
        .withColumnRenamed("rank", "rnk")


# pruned-ANN gate: 8 well-separated synthetic clusters derived from
# vec_id (sqlgen.clustered_vec_elem_sql) — within-cluster cosine ≈ 0.99,
# across ≈ 0.05, so the exact top-3 is provably within-cluster and a
# pruned probe that covers the query's cluster reconstructs it exactly
ANN_TRUE_CLUSTERS = 8


def _clustered_elems() -> list[str]:
    return [
        sqlgen.clustered_vec_elem_sql("vec_id", i, ANN_TRUE_CLUSTERS)
        for i in range(EMB_DIM)
    ]


def q_emb_ann_pruned(spark, sf_dir):
    """IVF ANN with GENUINE pruning oracle-checked end-to-end: clustered
    embeddings derived deterministically from vec_id, k-means cells,
    n_probe=3 of 8 — the pruned candidate path must still reconstruct
    the exact top-k because cluster separation >> noise (the knn_tiled
    coverage-proof construction transplanted to vector search; closes
    the round-2 'gates plumbing, not pruning' caveat)."""
    from mapsplit_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("array(" + ", ".join(_clustered_elems()) + ")").alias("cvec")
    )
    queries = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("qid"), F.col("cvec").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("cvec").alias("c_vec"))
    return ivf_topk(
        queries, corpus, EMB_DIM, k=3,
        n_clusters=ANN_TRUE_CLUSTERS, n_probe=3,
    ).withColumnRenamed("rank", "rnk")


def q_emb_cosine_topk(spark, sf_dir):
    """Exact brute-force cosine top-k similarity search."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec"))
    return cosine_topk(queries, corpus, EMB_DIM, k=3).withColumnRenamed("rank", "rnk")


def q_events_asof(spark, sf_dir):
    """Backward as-of join (temporal engine addition): for every
    purchase event, the latest prior-or-equal click by the same user —
    the attribution query shape.  Spark side is operators/temporal.py's
    union+window form (ONE shuffle, no join node); the oracle is
    DuckDB's native ASOF LEFT JOIN, so the two engines prove the
    semantics against INDEPENDENT implementations.  Clicks are
    pre-aggregated to one row per (user, ts) — both engines — because
    as-of is otherwise ambiguous under duplicate right timestamps."""
    from mapsplit_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    j = asof_join(p, c, on="user_id", matched_ts_col="_cts")
    return j.select(
        "event_id",
        "user_id",
        _ev_us("ts").alias("ts_us"),
        "click_id",
        _ev_us("_cts").alias("click_ts_us"),
        (_ev_us("ts") - _ev_us("_cts")).alias("lag_us"),
    )


def q_event_sessions(spark, sf_dir):
    """Gap-based sessionization (30-minute inactivity gap) with per-
    session aggregates — lag + cumulative-sum windows, ONE shuffle.
    event_id breaks timestamp ties so the per-row session labels are
    deterministic in both engines."""
    from mapsplit_spark.operators.temporal import sessionize_gaps

    s = sessionize_gaps(
        _t(spark, sf_dir, "events"),
        "user_id", "ts", gap_s=1800, order_cols=["event_id"],
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(_ev_us("ts")).alias("first_us"),
        F.max(_ev_us("ts")).alias("last_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def q_event_window_join(spark, sf_dir):
    """Bounded range join (clicks in the hour BEFORE each purchase,
    same user) — the bin-bucketed equi-join rewrite from
    operators/temporal.py, aggregated per purchase.  The oracle states
    the raw inequality join; the engine never plans one (no BNLJ —
    pinned in tests/test_temporal.py)."""
    from mapsplit_spark.operators.temporal import range_join_binned

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    pairs = range_join_binned(
        p, c, on="user_id", left_ts="ts", right_ts="c_ts",
        lower_s=-3600, upper_s=0, strict_lower=True,
    )
    return pairs.groupBy("purchase_id", "user_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(F.sum("c_value"), 6).alias("click_value"),
    )


# 16-bit portable SimHash: generated ONCE by sqlgen, used verbatim in
# both engines (same pattern as the tile-math formulas).
_SIMHASH_VOTES = [sqlgen.simhash_vote_agg_sql("tok", b) for b in range(16)]
_SIMHASH_COMBINE = sqlgen.simhash_combine_sql([f"v{b}" for b in range(16)])

from mapsplit_spark.operators.sampling import portable_hash_sql  # noqa: E402

# shared portable bucket for the sampling gates (salt must match the
# Spark-side deterministic_split/stratified_cap calls)
_PHASH_BUCKET = portable_hash_sql("doc_id", salt="r5")

from mapsplit_spark.operators.sampling import weighted_key_sql  # noqa: E402

# shared A-ES key for the weighted-sample gate (salt must match)
_WEIGHTED_KEY = weighted_key_sql("doc_id", "greatest(n_chars, 1)", "r5w")


def q_doc_simhash(spark, sf_dir):
    """SimHash document signatures (Charikar 2002 sign-random-
    projection) with a PORTABLE md5-nibble token hash so the driver
    gate verifies the construction value-exactly — the same
    md5-variant-vs-xxhash64-production split as doc_winnow (the
    production ``simhash_text`` in operators/dedup.py hashes with
    xxhash64 and is pytest-pinned for locality; WHICH bits a hash
    yields is hash-specific, so the two variants are deliberately not
    cross-comparable).  Shape: explode distinct tokens, one grouped
    aggregate with 16 vote SUMs, scalar combine — one shuffle."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("tok"),
    )
    votes = toks.groupBy("doc_id").agg(
        *[F.expr(v).alias(f"v{b}") for b, v in enumerate(_SIMHASH_VOTES)],
        F.count("*").alias("n_tok"),
    )
    return votes.select(
        "doc_id",
        F.expr(_SIMHASH_COMBINE).alias("simhash"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )


# multi-ring clip fixture (r5): 40 diamond outers + 8 diamond holes
# (the gate forces use_index=True — the auto threshold sits at the
# measured ~1000-ring crossover, far above an oracle-sized fixture);
# vertex coords quantized to .25 so SQL literals are exact doubles, and
# diamonds have no horizontal edges (ring_pip_sql requirement)
def _diamond(cx, cy, rx, ry):
    return [(cx - rx, cy), (cx, cy - ry), (cx + rx, cy), (cx, cy + ry)]


CLIP_MULTI_OUTERS = [
    _diamond(
        -168.0 + (i % 8) * 43.0 + (i * 7 % 5),
        -70.0 + (i // 8) * 31.0 + (i * 3 % 7),
        8.5 + (i % 4) * 2.25,
        6.5 + (i % 3) * 2.75,
    )
    for i in range(40)
]
CLIP_MULTI_HOLES = [
    _diamond((r[0][0] + r[2][0]) / 2, (r[1][1] + r[3][1]) / 2, 2.25, 1.75)
    for r in CLIP_MULTI_OUTERS[::5]
]


def q_clip_strtree(spark, sf_dir):
    """North-star PIP join at many-ring scale: 40 outer + 8 hole rings
    clipped through the STR-tree-indexed Arrow kernel (strtree.py —
    vectorized packed-R-tree descent + one batched even-odd pass), the
    web-scale replacement for the reference's per-ring scan
    (clipPoly/isInside, MapSplit.java:999-1145).  use_index=True forces
    the tree even at this ring count; results are bit-equal to the
    linear scan (tests/test_strtree.py) and to the oracle's 48 unrolled
    ring_pip_sql predicates."""
    import numpy as np

    from mapsplit_spark.operators.clip import clip_points

    def ring_np(vs):
        r = np.array(vs, dtype=np.float64)
        return (r, (r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()))

    pts = _event_points(spark, sf_dir)
    kept = clip_points(
        pts,
        [ring_np(v) for v in CLIP_MULTI_OUTERS],
        [ring_np(v) for v in CLIP_MULTI_HOLES],
        use_index=True,
    )
    return kept.select("event_id")


def q_user_distinct_hll(spark, sf_dir):
    """Portable HyperLogLog (p=8) distinct-user-action sketch per event
    type (operators/sketches.py): register/rho from the shared
    md5-nibble formulas (sqlgen.hll_*), fold with exact-dyadic 2^-rho
    literals — the estimate is bit-deterministic across engines and
    partitionings, so the gate is value-exact even though the SKETCH is
    approximate.  Raw (uncorrected) estimate: the linear-counting
    branch needs ln(), which is engine libm — the production operator
    applies it; the gate pins the portable pipeline."""
    from mapsplit_spark.operators.sketches import hll_distinct

    ev = _t(spark, sf_dir, "events")
    elem = "concat(cast(user_id as string), ':', props)"
    out = hll_distinct(ev, ["event_type"], elem, p=8, salt="r5",
                       portable=True, corrected=False)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct(F.expr(elem)).cast("long").alias("exact_distinct")
    )
    return (
        out.join(exact, "event_type")
        .select(
            "event_type", "n_reg",
            F.round("hll_estimate", 3).alias("hll_estimate"),
            "exact_distinct",
        )
    )


def q_doc_weighted_sample(spark, sf_dir):
    """Deterministic weighted sample (Efraimidis-Spirakis A-ES over the
    portable hash): top 25 docs per language by u^(1/w), w = doc
    length — longer docs proportionally likelier, selection reproducible
    across runs/engines (operators/sampling.py::weighted_sample)."""
    from mapsplit_spark.operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"), "doc_id", "greatest(n_chars, 1)",
        25, ["lang"], salt="r5w",
    ).select("doc_id", "lang")


def q_event_quantiles(spark, sf_dir):
    """Per-type exact value quantiles (type-7 linear interpolation —
    Spark `percentile` ≡ DuckDB `quantile_cont`), the corpus-statistics
    gate for the engine's distribution profiling; the approx scale path
    (approx_percentile / Greenwald-Khanna) is pytest-bounded against
    this exact operator in tests/test_sketches.py."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            *[
                F.round(F.expr(f"percentile(value, {p})"), 4).alias(f"q{int(p * 100)}")
                for p in (0.25, 0.5, 0.75, 0.95)
            ],
        )
    )


def q_doc_split(spark, sf_dir):
    """Deterministic train/val/test split (training-pipeline engine
    addition): every doc hashed into a named split by the PORTABLE
    md5-prefix bucket — stable across runs/partitionings/engines,
    map-only (no shuffle; pinned in tests/test_sampling.py).  Per-doc
    output so the gate checks every single assignment."""
    from mapsplit_spark.operators.sampling import deterministic_split

    return deterministic_split(
        _t(spark, sf_dir, "documents"), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1}, salt="r5",
    ).select("doc_id", "split")


def q_doc_stratified(spark, sf_dir):
    """Per-language stratified cap: at most 40 docs per lang, selected
    in portable-hash order — a reproducible uniform per-stratum
    subsample (corpus balancing op).  One shuffle."""
    from mapsplit_spark.operators.sampling import stratified_cap

    return stratified_cap(
        _t(spark, sf_dir, "documents"), ["lang"], 40, "doc_id", salt="r5",
    ).select("doc_id", "lang")


def q_lang_top_terms(spark, sf_dir):
    """Per-language top-10 terms by raw frequency — the exact
    heavy-hitters formulation (operators/sketches.py::exact_top_items):
    one partial-agg shuffle on (lang, term) + the rank-pushdown window,
    deterministic order (cnt DESC, term ASC).  The bounded-memory scale
    path (`frequent_items_mg`: Misra-Gries candidates + exact recount,
    the item domain never fully shuffles) is pytest-pinned to equal
    this operator on planted heavy hitters."""
    from mapsplit_spark.operators.sketches import exact_top_items
    from mapsplit_spark.operators.textstats import TFIDF_TOKEN_RE

    toks = _t(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit(TFIDF_TOKEN_RE), F.lit(0))
        ).alias("term"),
    )
    return exact_top_items(toks, ["lang"], "term", 10)


def q_tile_focal(spark, sf_dir):
    """Focal (neighborhood) statistics — the raster-algebra box-kernel
    sum at Chebyshev radius 1 over the A2 per-tile histogram
    (operators/focal.py): each tile SCATTERS its count to its (2r+1)²
    window map-side, one partially-aggregated groupBy sums per cell —
    scatter ≡ gather for the symmetric kernel, one exchange at any
    radius, grid-clamped before the shuffle.  Oracle: the gather
    formulation (counts × offsets cross join) in DuckDB."""
    from mapsplit_spark.operators.focal import focal_sum
    from mapsplit_spark.sinks.manifests import tile_counts

    return focal_sum(
        tile_counts(_event_pairs(spark, sf_dir)), ZOOM, radius=1,
        scatter_partitions=max(8, spark.sparkContext.defaultParallelism // 4))


def q_event_geohash(spark, sf_dir):
    """Geohash cell ids (public base-32 bit-interleave — the third cell
    encoding next to Morton/quadkey, cellid.py): per event point the
    precision-8 and precision-5 codes via the ENGINE's shift/mask
    column kernel (cellid.geohash_col, codegen, no UDF), gated against
    an INDEPENDENT FLOOR/mod arithmetic + SUBSTR-alphabet oracle
    formulation (sqlgen.geohash_chars_sql) — the tile_cellid
    two-formulations pattern.  Precision 5 exercises the odd-total
    interleave (13 lon / 12 lat bits); the float→int quantization step
    shares identical arithmetic text in both engines (FP parity), the
    encoding layer does not."""
    from mapsplit_spark.cellid import geohash_col

    return _event_points(spark, sf_dir).select(
        "event_id",
        geohash_col(F.col("lon"), F.col("lat"), 5).alias("gh5"),
        geohash_col(F.col("lon"), F.col("lat"), 8).alias("gh8"),
    )


def q_doc_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (corpus keyword extraction —
    training-data curation surface): tf·ln(N/df), rank ties broken by
    (ROUND(tfidf,4) DESC, term ASC) in BOTH engines so the gate is
    value-exact (operators/textstats.py::tfidf_topk).  The oracle
    restates it declaratively over DuckDB's unnest/regexp tokenizer —
    same ASCII token regex, independent relational plan."""
    from mapsplit_spark.operators.textstats import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


def q_tile_clusters(spark, sf_dir):
    """Grid-density spatial clustering (DBSCAN over the tile grid,
    operators/clustering.py): cells with ≥ min_pts events are dense;
    8-connected dense cells share a cluster id (the component's
    MIN cell key).  Engine builds adjacency by map-side SCATTER of ≤ 8
    neighbour keys + one equi-join, then the pointer-jumping
    connected-components fixpoint; the oracle states the |dense|² theta
    join + WITH RECURSIVE reachability directly — independent
    formulations of both the adjacency and the closure.  The density
    threshold is SF-relative (max(2, n/2000), same floor arithmetic in
    both engines) so the gate exercises real multi-cell components at
    every fixture size; the count() is a 1-row driver scalar, the same
    bounded-collect class as the IVF probe-cell ids."""
    from mapsplit_spark.operators.clustering import grid_clusters

    pts = _event_points(spark, sf_dir)
    min_pts = max(2, pts.count() // CLUSTER_DENOM)
    return grid_clusters(
        pts, "event_id", "lon", "lat", CLUSTER_ZOOM, min_pts,
    )


def q_term_cms(spark, sf_dir):
    """Count-Min sketch point queries (operators/sketches.py): the d×256
    portable sketch over the corpus token stream (state ≤ depth×width
    rows at ANY domain size), probed for the distinct tokens of a
    deterministic doc subset; exact counts alongside, so the gate data
    itself exhibits the CMS guarantee (est ≥ exact).  Oracle:
    sqlgen.cms_gate_sql — the same salted-md5 row hashes run verbatim,
    estimate restated as MIN over a plain LEFT JOIN."""
    from mapsplit_spark.operators.sketches import cms_query, cms_sketch
    from mapsplit_spark.operators.textstats import TFIDF_TOKEN_RE

    # widened: the tokenization subtree feeds THREE consumers (sketch,
    # probes, exact counts) and each ran as a single task off the
    # single-file scan (three concurrent 1.5-2.8 s stages; A/B none/8 →
    # 1.7-4.0/1.0-1.8 s).  Same artifact-or-no-op reasoning as
    # q_doc_winnow's repartition (r6).
    docs = _t(spark, sf_dir, "documents").repartition(
        max(8, spark.sparkContext.defaultParallelism // 4))
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit(TFIDF_TOKEN_RE), F.lit(0))
        ).alias("term"),
    )
    probes = (toks.filter(F.col("doc_id") % 101 == 7)
              .select("term").distinct())
    sk = cms_sketch(toks, "term", depth=CMS_DEPTH, portable=True)
    est = cms_query(sk, probes, "term", depth=CMS_DEPTH, portable=True)
    exact = toks.groupBy("term").agg(F.count("*").cast("long").alias("exact_cnt"))
    return (
        est.join(exact, est["item"] == exact["term"], "left")
        .select("item", "cms_est",
                F.coalesce("exact_cnt", F.lit(0)).cast("long").alias("exact_cnt"))
    )


def q_way_geometry(spark, sf_dir):
    """Per-way polyline geometry (operators/geometry.py): haversine
    length, bbox, and vertex centroid per lineitem 'way' (ordered by
    linenumber) — every accumulated quantity integer-quantized
    (mm / microdegrees) so the sums are order-independent and the gate
    value-exact.  One shuffle: the lead() window and the aggregate
    share the way key."""
    from mapsplit_spark.operators.geometry import polyline_stats

    nodes = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").alias("seq"),
        F.expr(sqlgen.derived_lon_sql(NID)).alias("lon"),
        F.expr(sqlgen.derived_lat_sql(NID)).alias("lat"),
    )
    return polyline_stats(nodes, "way_id", "seq", "lon", "lat")


def q_doc_contamination(spark, sf_dir):
    """Train→test contamination via winnow fingerprints
    (operators/contamination.py): test docs (doc_id % 5 = 0) sharing
    ≥ 2 winnow fingerprints with a training doc, after dropping
    ubiquitous fingerprints (doc frequency > 20 — the exact hot-key
    cap).  One fp equi-join, never the test×train theta join; the
    winnowing guarantee makes misses impossible for any shared
    substring ≥ w+k−1 chars.  Oracle restates it over DuckDB's
    list-based winnow CTE (the doc_winnow formulation, kept exploded)."""
    from mapsplit_spark.operators.contamination import contamination_pairs

    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    test_ids = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    return contamination_pairs(docs, test_ids, max_df=20, min_shared=2,
                               portable=True)


def q_ring_zonal(spark, sf_dir):
    """Zonal statistics over the 48-ring fixture (operators/clip.py::
    zone_assign): per containing OUTER ring, the point count and an
    exact id checksum — the raster-algebra 'zonal sum' over vector
    zones.  The STR-tree pair descent emits (point, zone) rows; the
    aggregation is a plain partial-agg groupBy.  Oracle: 40 unrolled
    per-ring ring_pip_sql aggregates UNION ALL'd (same even-odd
    formula text as the clip gates)."""
    import numpy as np

    from mapsplit_spark.operators.clip import zone_assign

    def ring_np(vs):
        r = np.array(vs, dtype=np.float64)
        return (r, (r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()))

    za = zone_assign(
        _event_points(spark, sf_dir),
        [ring_np(v) for v in CLIP_MULTI_OUTERS],
        [ring_np(v) for v in CLIP_MULTI_HOLES],
        id_col="event_id", use_index=True,
    )
    return za.groupBy("zone").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )


HEX_S_COARSE = 4.0  # lattice circumradii (degrees) for the hex gate
HEX_S_FINE = 0.7
DWITHIN_MOD = 7     # gate subset: event_id % 7 == 0 (oracle is O(n²))
DWITHIN_KM = 400.0


def q_event_hexcell(spark, sf_dir):
    """Hexagonal cell ids (the H3 lattice analog, hexgrid.py): per
    event point the axial (q, r) cell at two lattice sizes via cube
    rounding — JVM column arithmetic (hex_cell_cols: codegen, map-only,
    no UDF), gated against the sqlgen.hex_qr_sql oracle formulation.
    The cube-round arithmetic text is shared for FP parity (the
    geohash pattern); the independent check is the nearest-center
    brute force in tests/test_hexgrid.py (hexagons are the lattice's
    Voronoi cells, so containment ≡ nearest center)."""
    from mapsplit_spark.hexgrid import hex_cell_cols

    pts = _event_points(spark, sf_dir)
    qc, rc = hex_cell_cols(F.col("lon"), F.col("lat"), HEX_S_COARSE)
    qf, rf = hex_cell_cols(F.col("lon"), F.col("lat"), HEX_S_FINE)
    return pts.select(
        "event_id",
        qc.alias("hq_c"), rc.alias("hr_c"),
        qf.alias("hq_f"), rf.alias("hr_f"),
    )


def q_knn_hex(spark, sf_dir):
    """kNN via HEX k-ring candidate generation + exact haversine
    re-rank — the north star's H3-kRing wording on the engine's own
    hex lattice (knn.knn_hex).  Exact at any density: per-level
    coverage proof (inscribed-square meridian/parallel bounds over the
    k-disk's guaranteed degree radius), disk-radius escalation, brute
    force for the unprovable tail — so the oracle is the exact-kNN
    brute-force SQL.  Distinct query points from the tile-ring knn
    gates (different derivation key)."""
    from mapsplit_spark.operators.knn import knn_hex

    qk = "(n_nationkey * 53 + 7)"
    queries_df = _t(spark, sf_dir, "nation").filter("n_nationkey < 5").select(
        F.col("n_nationkey").cast("long").alias("query_id"),
        F.expr(sqlgen.derived_lon_sql(qk)).alias("q_lon"),
        F.expr(sqlgen.derived_lat_sql(qk)).alias("q_lat"),
    )
    points = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("point_id"),
        F.expr(EV_LON).alias("p_lon"),
        F.expr(EV_LAT).alias("p_lat"),
    )
    return knn_hex(queries_df, points, s_deg=2.0, k=5).withColumnRenamed("rank", "rnk")


def q_points_dwithin(spark, sf_dir):
    """Within-distance spatial self-join (operators/dwithin.py): every
    pair of subset points within 400 km — grid method over the hex
    lattice with a LAT-ADAPTIVE scatter radius (the 1/cos(lat) lon-span
    blowup is paid only by the cells that sit there) and antimeridian
    ghosting; the refine uses original coordinates, so every distance
    is bit-identical to the oracle's brute-force O(n²) restatement.
    The gate runs on the event_id % 7 subset because the ORACLE is
    quadratic; the engine side takes any DataFrame."""
    from mapsplit_spark.operators.dwithin import dwithin_pairs

    # widen the single-file scan before the grid self-join: the
    # cell-pair joins broadcast their small sides, so the haversine
    # refine chain inherits the scan's 1-2 partitions otherwise
    # (measured: 2 tasks carried 3.9 s of the 4.1 s total).  A QUARTER
    # of the cores, not all of them — each extra task pays ~0.4 s of
    # generated-code warmup on this row count, and the interleaved A/B
    # read none/8/16/32 → 5.0-7.7/2.9-3.8/3.1-4.1/4.5-5.2 s (r6).
    pts = _event_points(spark, sf_dir).filter(
        F.col("event_id") % DWITHIN_MOD == 0
    ).repartition(max(8, spark.sparkContext.defaultParallelism // 4))
    return dwithin_pairs(pts, "event_id", "lon", "lat", DWITHIN_KM)


def q_user_trajectory(spark, sf_dir):
    """Per-user GPS-trace statistics (geometry.trajectory_stats): the
    event stream as a trajectory — path length (exact integer mm per
    step), longest step, net first→last displacement, duration,
    tortuosity.  One shuffle: the lag window and the groupBy share the
    user partitioning (exchange reuse pinned in tests/test_hexgrid.py).
    Oracle: the DuckDB window restatement with arg_min/arg_max
    endpoints (trajectory_stats_sql)."""
    from mapsplit_spark.operators.geometry import trajectory_stats

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat"),
    )
    return trajectory_stats(ev, "user_id", "ts", "event_id", "lon", "lat")


# synthetic road network for the snap gate: per user, a short eastbound
# polyline with a deterministic lat wiggle; probe points are vertex
# offsets.  The vertex arithmetic is SHARED TEXT (F.expr here, verbatim
# in the oracle CTE) over the window row number — FP parity by
# construction.
SNAP_VX = f"({sqlgen.derived_lon_sql('user_id')} + 0.02 * rn)"
SNAP_VY = f"({sqlgen.derived_lat_sql('user_id')} + 0.005 * ((rn * 7) % 11))"
SNAP_PLON = f"({SNAP_VX} + 0.004 * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END))"
SNAP_PLAT = f"({SNAP_VY} + 0.003 * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END))"
SNAP_KM = 2.0


def q_point_snap(spark, sf_dir):
    """Snap-to-nearest-segment (map matching primitive,
    operators/snap.py): every 5th trace point snaps to the nearest
    road segment within 2 km under the shared local-plane metric
    (snap_dist_sql) — per-segment lat-adaptive hex scatter, one
    equi-join, partial-agg min(struct) winner.  Roads are a
    deterministic per-user polyline derived from the events window
    (SNAP_VX/VY — shared text with the oracle); the oracle restates
    the query as the brute-force points × segments cross join."""
    from pyspark.sql.window import Window

    from mapsplit_spark.operators.snap import snap_to_segments

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts") \
        .withColumn("rn", F.row_number().over(w))
    verts = base.select(
        "user_id", "event_id", "ts", "rn",
        F.expr(SNAP_VX).alias("vx"), F.expr(SNAP_VY).alias("vy"),
    )
    # lead() ordered by the SAME (ts, event_id) key as the row_number
    # window (rn is strictly increasing in it, so the sequence is
    # identical) — ordering by rn forced a second per-partition sort
    # between the two Window nodes (r6, guide §2.4)
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    segs = verts.withColumns({
        "x2": F.lead("vx").over(wv), "y2": F.lead("vy").over(wv),
    }).filter(F.col("x2").isNotNull()).select(
        F.col("user_id").alias("way_id"), F.col("rn").alias("seq"),
        F.col("vx").alias("x1"), F.col("vy").alias("y1"), "x2", "y2",
    )
    points = base.filter(F.col("event_id") % 5 == 0).select(
        F.col("event_id").alias("pid"),
        F.expr(SNAP_PLON).alias("lon"), F.expr(SNAP_PLAT).alias("lat"),
    )
    return snap_to_segments(points, segs, d_km=SNAP_KM,
                            scatter_partitions=spark.sparkContext.defaultParallelism)


RASTER_ZOOM = 7  # vector→raster gate: 128×128 global grid


def q_ring_raster(spark, sf_dir):
    """Vector→raster conversion (the north star's raster↔vector
    surface): rasterize the 40-ring zone fixture onto the z7 tile grid
    by center-in-polygon — the ENGINE runs the production STR-tree
    Arrow kernel (clip.zone_assign) over a GENERATED tile-center grid
    (16 k rows at z7; a higher-zoom raster would bbox-prune candidates
    first), then joins the z13 event tile assignment (quadtree
    bit-shift, never re-projected) against the covered cells.  → per
    zone: covered-tile count + events landing in covered cells.
    Oracle: 40 unrolled ring_pip_sql predicates over a generate_series
    grid — an INDEPENDENT even-odd formulation (the ring_zonal
    pattern), sharing only the tile-center arithmetic text."""
    import numpy as np

    from mapsplit_spark.operators.clip import zone_assign

    n = 1 << RASTER_ZOOM
    d = ZOOM - RASTER_ZOOM

    def ring_np(vs):
        r = np.array(vs, dtype=np.float64)
        return (r, (r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()))

    # coalesce the generated grid to a few fat partitions BEFORE the
    # Arrow PIP kernel: spark.range defaults to one partition per core
    # (4 rows each here), and every task pays the Python worker + ring
    # index setup (~0.6 s × 32 tasks of fixed cost measured at sf0.1)
    grid = spark.range(n).coalesce(4) \
        .select(F.col("id").cast("int").alias("x")) \
        .withColumn("y", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    centers = grid.select(
        (F.col("x").cast("long") * n + F.col("y")).alias("cell_id"),
        F.expr(sqlgen.tile2lon_sql("x + 0.5", RASTER_ZOOM)).alias("lon"),
        F.expr(sqlgen.tile2lat_sql("y + 0.5", RASTER_ZOOM)).alias("lat"),
    )
    za = zone_assign(centers, [ring_np(v) for v in CLIP_MULTI_OUTERS], [],
                     id_col="cell_id", use_index=True)
    raster = za.select(
        F.col("zone").cast("int").alias("zone"),
        (F.col("cell_id") / n).cast("long").alias("x"),
        F.pmod(F.col("cell_id"), F.lit(n)).cast("long").alias("y"),
    )
    ev = assign_tiles(_event_points(spark, sf_dir), "event_id", "lon", "lat",
                      ZOOM).select(
        F.shiftright("tile_x", d).cast("long").alias("x"),
        F.shiftright("tile_y", d).cast("long").alias("y"),
    )
    n_tiles = raster.groupBy("zone").agg(
        F.count("*").cast("long").alias("n_tiles"))
    n_events = ev.join(F.broadcast(raster), ["x", "y"]).groupBy("zone").agg(
        F.count("*").cast("long").alias("n_events"))
    return n_tiles.join(n_events, "zone", "left").select(
        "zone", "n_tiles",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


def q_way_rings(spark, sf_dir):
    """Closed-ring polygon statistics (geometry.ring_stats): every
    lineitem 'way' read as a ring (implicit closing edge) — perimeter
    incl. the wrap edge, signed shoelace double-area as an EXACT
    integer sum (deg²·1e9 per-edge quantization), winding direction,
    and the equirectangular km² area.  One shuffle (lead + wrap
    first_value + agg share the way key).  Oracle: the DuckDB WINDOW
    restatement in ring_stats_sql."""
    from mapsplit_spark.operators.geometry import ring_stats

    nodes = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").alias("seq"),
        F.expr(sqlgen.derived_lon_sql(NID)).alias("lon"),
        F.expr(sqlgen.derived_lat_sql(NID)).alias("lat"),
    )
    return ring_stats(nodes, "way_id", "seq", "lon", "lat")


def q_tile_idw(spark, sf_dir):
    """IDW interpolation onto the z7 tile grid
    (operators/interpolate.py): the event `value` surface estimated at
    every tile center from the samples of its 3×3 neighborhood —
    map-side scatter (the focal inverted-kernel trick) + ONE
    partially-aggregated groupBy; weights and values quantized to
    exact integers per pair so the quotient of sums is
    order-independent.  Oracle: the GATHER formulation (tiles ×
    offsets cross join) with shared weight/haversine text."""
    from mapsplit_spark.operators.interpolate import idw_grid

    # widened: the scatter + exact-integer-quantized partial agg ran on
    # the 1-2 single-file scan partitions (A/B none/8 → 1.6-3.1/1.1-1.9 s)
    pts = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat"),
        "value",
    ).repartition(max(8, spark.sparkContext.defaultParallelism // 4))
    return idw_grid(pts, "event_id", "lon", "lat", "value",
                    RASTER_ZOOM, radius=1)


def q_zone_transitions(spark, sf_dir):
    """Geofence enter/exit detection (operators/geofence.py): per-user
    consecutive events whose min-containing-zone differs — PIP via the
    production STR-tree Arrow kernel (independent of the oracle's 40
    unrolled ring_pip_sql predicates folded with LEAST), transitions
    via the per-user lag window.  Zone −1 = outside all rings."""
    import numpy as np

    from mapsplit_spark.operators.geofence import zone_transitions

    def ring_np(vs):
        r = np.array(vs, dtype=np.float64)
        return (r, (r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()))

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat"),
    )
    return zone_transitions(ev, "user_id", "ts", "event_id", "lon", "lat",
                            [ring_np(v) for v in CLIP_MULTI_OUTERS])


def q_user_heading(spark, sf_dir):
    """Circular movement statistics (geometry.heading_stats): per-user
    circular mean of the per-step forward azimuths + resultant length
    (directedness).  The circular mean is atan2 of sin/cos SUMS, so
    each term is quantized to an exact 1e9 integer per step — the gate
    is value-exact despite being trig-heavy.  One shuffle."""
    from mapsplit_spark.operators.geometry import heading_stats

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat"),
    )
    return heading_stats(ev, "user_id", "ts", "event_id", "lon", "lat")


def q_tile_flows(spark, sf_dir):
    """Origin→destination tile flows (geometry.tile_flows): per
    directed z5 tile pair, the move count and distinct movers over
    every user's consecutive event pairs — the flow-map / OD-matrix
    aggregation.  Two shuffles by construction (user window → flow-key
    groupBy); tile math map-side, shared text with the oracle."""
    from mapsplit_spark.operators.geometry import tile_flows

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat"),
    )
    return tile_flows(ev, "user_id", "ts", "event_id", "lon", "lat", zoom=5)


GEODUP_KM = 3000.0  # "same scene" radius for the geo near-dup gate


def q_geo_image_dups(spark, sf_dir):
    """Geo-constrained image near-dup — the 'same scene photographed
    twice' detector an image-ingest pipeline runs: pairs whose pHash
    Hamming distance ≤ 3 AND whose locations are within 3000 km.
    Plan: candidates come from the HASH side (the exact-recall
    pigeonhole band join — far more selective than any geo bucket at
    this radius), coordinates join back on the id, haversine refines.
    Derived phash keys use event_id/7 so the planted dup groups fall
    INSIDE the %7 gate subset; oracle = brute force over both
    predicates."""
    from mapsplit_spark.operators.dedup import hamming_near_dups

    key = f"CAST(FLOOR(event_id / {DWITHIN_MOD}.0) AS BIGINT)"
    bands = [sqlgen.derived_phash_band_sql(key, k) for k in range(4)]
    sub = _t(spark, sf_dir, "events").filter(
        F.col("event_id") % DWITHIN_MOD == 0
    ).select(
        F.col("event_id").alias("pid"),
        F.expr(sqlgen.phash_from_bands_sql(bands)).alias("phash"),
        F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat"),
    )
    pairs = hamming_near_dups(sub.select("pid", "phash"), id_col="pid",
                              hash_col="phash", radius=3, n_bands=4, bits=60)
    coords = sub.select("pid", "lon", "lat")
    hav = sqlgen.haversine_sql("a_lat", "a_lon", "b_lat", "b_lon")
    return (
        pairs.join(coords.select(F.col("pid").alias("id_a"),
                                 F.col("lon").alias("a_lon"),
                                 F.col("lat").alias("a_lat")), "id_a")
        .join(coords.select(F.col("pid").alias("id_b"),
                            F.col("lon").alias("b_lon"),
                            F.col("lat").alias("b_lat")), "id_b")
        .withColumn("dist_km", F.round(F.expr(hav), 6))
        .filter(F.col("dist_km") <= GEODUP_KM)
        .select("id_a", "id_b", "hamming", "dist_km")
    )


def q_gps_spikes(spark, sf_dir):
    """Implausible-speed step detection (geometry.gps_spikes) — the
    trace-cleaning pass before trusting geo labels: steps whose implied
    speed exceeds 1000 km/h (teleports / corrupted fixes).  Speed from
    EXACT integer step-mm and µs duration, so the threshold decision
    is bit-identical in both engines; zero-duration moving steps are
    spikes by definition.  One shuffle."""
    from mapsplit_spark.operators.geometry import gps_spikes

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(EV_LON).alias("lon"), F.expr(EV_LAT).alias("lat"),
    )
    return gps_spikes(ev, "user_id", "ts", "event_id", "lon", "lat",
                      max_kmh=1000.0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_assign": q_tile_assign,
        "tile_assign_border": q_tile_assign_border,
        "tile_counts": q_tile_counts,
        "tile_manifest": q_tile_manifest,
        "modified_tiles": q_modified_tiles,
        "modified_tiles_sessions": q_modified_tiles_sessions,
        "tile_pyramid": q_tile_pyramid,
        "latest_ts": q_latest_ts,
        "bounds_union": q_bounds_union,
        "session_tiles": q_session_tiles,
        "node_backfill": q_node_backfill,
        "tile_bounds": q_tile_bounds,
        "clip_convex": q_clip_convex,
        "tile_merge": q_tile_merge,
        "clip_ring": q_clip_ring,
        "relation_tiles": q_relation_tiles,
        "complete_rel": q_complete_rel,
        "complete_rel_mp": q_complete_rel_mp,
        "mbtiles_rows": q_mbtiles_rows,
        "lsh_near_dup": q_lsh_near_dup,
        "phash_near_dup": q_phash_near_dup,
        "dup_components": q_dup_components,
        "doc_dedup_keep": q_doc_dedup_keep,
        "tile_cellid": q_tile_cellid,
        "session_holefill": q_session_holefill,
        "knn": q_knn,
        "knn_tiled": q_knn_tiled,
        "doc_token_stats": q_doc_token_stats,
        "doc_quality": q_doc_quality,
        "lang_profile": q_lang_profile,
        "doc_exact_dup": q_doc_exact_dup,
        "doc_lang_id": q_doc_lang_id,
        "doc_winnow": q_doc_winnow,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_jaccard_pairs": q_doc_jaccard_pairs,
        "emb_near_dup": q_emb_near_dup,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_ann_topk": q_emb_ann_topk,
        "emb_ann_pruned": q_emb_ann_pruned,
        "events_asof": q_events_asof,
        "doc_split": q_doc_split,
        "doc_stratified": q_doc_stratified,
        "event_sessions": q_event_sessions,
        "event_window_join": q_event_window_join,
        "doc_simhash": q_doc_simhash,
        "clip_strtree": q_clip_strtree,
        "user_distinct_hll": q_user_distinct_hll,
        "doc_weighted_sample": q_doc_weighted_sample,
        "event_quantiles": q_event_quantiles,
        "event_geohash": q_event_geohash,
        "doc_tfidf": q_doc_tfidf,
        "tile_focal": q_tile_focal,
        "lang_top_terms": q_lang_top_terms,
        "tile_clusters": q_tile_clusters,
        "term_cms": q_term_cms,
        "way_geometry": q_way_geometry,
        "doc_contamination": q_doc_contamination,
        "ring_zonal": q_ring_zonal,
        "event_hexcell": q_event_hexcell,
        "knn_hex": q_knn_hex,
        "points_dwithin": q_points_dwithin,
        "user_trajectory": q_user_trajectory,
        "point_snap": q_point_snap,
        "ring_raster": q_ring_raster,
        "way_rings": q_way_rings,
        "tile_idw": q_tile_idw,
        "zone_transitions": q_zone_transitions,
        "user_heading": q_user_heading,
        "tile_flows": q_tile_flows,
        "geo_image_dups": q_geo_image_dups,
        "gps_spikes": q_gps_spikes,
    }


# ------------------------------------------------------------- oracle SQL

def _oracle_tile_assign() -> str:
    a = sqlgen.assign_cte_sql(
        "(SELECT event_id, " + EV_LON + " AS lon, " + EV_LAT + " AS lat FROM events) ev",
        "event_id", "lon", "lat", ZOOM, 0.0,
    )
    return f"SELECT element_id, tile_x, tile_y FROM ({a}) z"


def _oracle_session_cte() -> str:
    return f"""
WITH nodes AS ({_events_nodes_cte()}),
members AS (
  SELECT l_orderkey AS way_id, {NID} AS member_id FROM lineitem
),
node_ids AS (SELECT DISTINCT element_id FROM nodes),
bad AS (
  SELECT DISTINCT m.way_id FROM members m
  LEFT JOIN node_ids n ON m.member_id = n.element_id
  WHERE n.element_id IS NULL
),
ok AS (SELECT m.* FROM members m WHERE m.way_id NOT IN (SELECT way_id FROM bad)),
wt AS (
  SELECT DISTINCT o.way_id, n.tile_x, n.tile_y
  FROM ok o JOIN nodes n ON o.member_id = n.element_id
)
"""


def _lang_id_oracle() -> str:
    """DuckDB mirror of textstats.lang_id: per-profile stopword split
    counts, winner = max score with Spark's array_max-on-struct tie rule
    (lexicographically LARGEST lang among ties)."""
    padded = "(' ' || regexp_replace(trim(text), '\\s+', ' ', 'g') || ' ')"
    score_exprs = {
        lang: " + ".join(
            f"(len(str_split({padded}, ' {w} ')) - 1)" for w in words
        )
        for lang, words in textstats.LANG_PROFILES.items()
    }
    selects = ", ".join(f"({e}) AS s_{lang}" for lang, e in score_exprs.items())
    langs_desc = sorted(textstats.LANG_PROFILES, reverse=True)
    m = "GREATEST(" + ", ".join(f"s_{lang}" for lang in textstats.LANG_PROFILES) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = {m} THEN '{lang}'" for lang in langs_desc[:-1]
    ) + f" ELSE '{langs_desc[-1]}' END"
    return f"""
WITH scored AS (SELECT doc_id, {selects} FROM documents)
SELECT doc_id, {case} AS pred_lang, CAST({m} AS BIGINT) AS score FROM scored
"""


def _oracle_zoom_walk(counts: dict, zoom: int, node_limit: int) -> dict:
    """INDEPENDENT re-derivation of the reference merge walk
    (MapSplit.java:858-936) for the tile_merge oracle — VERDICT r3 #8:
    the gate's two sides previously shared ``compute_zoom_map``.  This
    formulation is closed-form over the monotone block-total ladder
    instead of the operator's stateful prev-block loop: with T(d) = the
    total of the aligned 2^d-block containing the tile (nondecreasing
    in d, since blocks nest) and L = node_limit, the committed level for
    an unmerged under-limit tile is

      * the FIRST d with T(d) > L, if that total is still < 4L
        ("found optimal size");
      * d−1, if T(d) ≥ 4L at that first crossing and d > 1
        ("last iteration was better" back-off; d = 1 commits nothing);
      * the deepest level (4) when no crossing occurs (T(4) ≤ L).

    Tiles are visited in ascending packed-key order; tiles committed by
    an earlier walk are skipped — same observable spec, no shared code
    with operators/optimize.py."""
    if node_limit <= 0:
        return {}
    deepest = 5 - 1  # MAX_ZOOM_OUT_DIFF − 1; reference walks d = 1..4
    out: dict = {}

    def block(key, d):
        bx, by = (key[0] >> d) << d, (key[1] >> d) << d
        return [(x, y)
                for x in range(bx, bx + (1 << d))
                for y in range(by, by + (1 << d)) if (x, y) in counts]

    for key in sorted(counts, key=lambda t: (t[0] << 16) | t[1]):
        if key in out or counts[key] >= node_limit:
            continue
        totals = {d: sum(counts[t] for t in block(key, d))
                  for d in range(1, deepest + 1)}
        crossing = next((d for d in range(1, deepest + 1)
                         if totals[d] > node_limit), None)
        if crossing is None:
            commit_d = deepest
        elif totals[crossing] < 4 * node_limit:
            commit_d = crossing
        elif crossing > 1:
            commit_d = crossing - 1
        else:
            continue
        for t in block(key, commit_d):
            out[t] = zoom - commit_d
    return out


def _tile_merge_oracle() -> str:
    """Full value-hash oracle for the §2.5 merge: the sequential walk is
    not SQL-expressible, so compute per-tile counts DuckDB-side, run the
    INDEPENDENTLY-written walk above (``_oracle_zoom_walk`` — different
    author-logic from the operator's compute_zoom_map, differentially
    pinned against it in tests/test_reference_ports.py), and embed the
    resulting tile→zoom remap as a VALUES table in the final SQL.  The
    correctness gate runs at sf0.01 (driver contract); override via
    SPARK_GRAFT_CORRECTNESS_DIR."""
    import duckdb

    sf = os.environ.get("SPARK_GRAFT_CORRECTNESS_DIR", "/root/testdata/sf0.01")
    if not os.path.exists(f"{sf}/events.parquet"):
        raise FileNotFoundError(sf)  # caught by oracle_sql → gate omitted
    nodes = _events_nodes_cte()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    counts = con.execute(
        f"SELECT tile_x, tile_y, count(*) AS n FROM ({nodes}) z GROUP BY 1, 2"
    ).fetchall()
    con.close()
    zmap = _oracle_zoom_walk({(r[0], r[1]): r[2] for r in counts}, ZOOM, 5)
    if not zmap:
        return (
            f"SELECT {ZOOM} AS zoom, tile_x, tile_y, count(*) AS n "
            f"FROM ({nodes}) z GROUP BY 1, 2, 3"
        )
    values = ", ".join(f"({x}, {y}, {z})" for (x, y), z in sorted(zmap.items()))
    return f"""
WITH nodes AS ({nodes}),
zmap(mx, my, nz) AS (SELECT * FROM (VALUES {values}) v(mx, my, nz)),
m AS (
  SELECT DISTINCT element_id,
         COALESCE(nz, {ZOOM}) AS zoom,
         CASE WHEN nz IS NOT NULL
              THEN CAST(FLOOR(tile_x / POWER(2.0, {ZOOM} - nz)) AS BIGINT)
              ELSE tile_x END AS mtx,
         CASE WHEN nz IS NOT NULL
              THEN CAST(FLOOR(tile_y / POWER(2.0, {ZOOM} - nz)) AS BIGINT)
              ELSE tile_y END AS mty
  FROM nodes LEFT JOIN zmap ON tile_x = mx AND tile_y = my
)
SELECT zoom, mtx AS tile_x, mty AS tile_y, count(*) AS n
FROM m GROUP BY 1, 2, 3
"""


def _clip_ring_oracle() -> str:
    """Corner-parity tile clip as pure SQL: each tile's 4 corners tested
    against the concave ring + hole with the unrolled even-odd crossing
    expression (same float64 tree as the numpy kernel).  Corners are
    materialized once in a CTE (4 rows/tile) so the per-edge terms
    reference plain columns — keeps the oracle's expression tree small."""
    nodes = _events_nodes_cte()
    corner_selects = []
    for u in (0, 1):
        for v in (0, 1):
            lon = sqlgen.tile2lon_sql(f"tile_x + {u}" if u else "tile_x", ZOOM)
            lat = sqlgen.tile2lat_sql(f"tile_y + {v}" if v else "tile_y", ZOOM)
            corner_selects.append(
                f"SELECT tile_x, tile_y, {lon} AS clon, {lat} AS clat FROM tiles"
            )
    corners = "\nUNION ALL\n".join(corner_selects)
    outer = sqlgen.ring_pip_sql("clon", "clat", CLIP_RING)
    hole = sqlgen.ring_pip_sql("clon", "clat", CLIP_HOLE)
    return f"""
WITH nodes AS ({nodes}),
tiles AS (SELECT DISTINCT tile_x, tile_y FROM nodes),
corners AS ({corners}),
hits AS (
  SELECT tile_x, tile_y,
         MAX(CASE WHEN {outer} THEN 1 ELSE 0 END) AS any_outer,
         MAX(CASE WHEN {hole} THEN 1 ELSE 0 END) AS any_hole
  FROM corners GROUP BY tile_x, tile_y
),
kept AS (SELECT tile_x, tile_y FROM hits WHERE any_outer = 1 AND any_hole = 0)
SELECT n.element_id, n.tile_x, n.tile_y
FROM nodes n JOIN kept k ON n.tile_x = k.tile_x AND n.tile_y = k.tile_y
"""


def _relation_cte() -> str:
    return f"""
WITH nodes AS ({_events_nodes_cte()}),
e1 AS (SELECT l_orderkey + {R1} AS rid, {NID} AS mid FROM lineitem),
e2 AS (SELECT o_custkey + {R2} AS rid, o_orderkey + {R1} AS mid FROM orders),
e3 AS (SELECT c_nationkey + {R3} AS rid, c_custkey + {R2} AS mid FROM customer),
r1 AS (SELECT DISTINCT rid AS element_id, n.tile_x, n.tile_y
       FROM e1 JOIN nodes n ON e1.mid = n.element_id),
r2 AS (SELECT DISTINCT rid AS element_id, r1.tile_x, r1.tile_y
       FROM e2 JOIN r1 ON e2.mid = r1.element_id),
r3 AS (SELECT DISTINCT rid AS element_id, r2.tile_x, r2.tile_y
       FROM e3 JOIN r2 ON e3.mid = r2.element_id)
"""


def _ring_values() -> str:
    """The RING_GROUPS fixture + its expected checkAndFill holes as a
    SQL VALUES list (BIGINT-cast so the union's way_id type matches)."""
    rows = [
        (gid, x, y)
        for gid, tiles in RING_GROUPS.items() for x, y in tiles
    ] + [
        (gid, x, y)
        for gid, holes in RING_HOLES.items() for x, y in holes
    ]
    return ", ".join(
        f"(CAST({g} AS BIGINT), CAST({x} AS BIGINT), CAST({y} AS BIGINT))"
        for g, x, y in sorted(rows)
    )


def _complete_rel_mp_oracle() -> str:
    """Mirror of sessions.session_assignments(complete=True,
    multipolygon_only=True, hole fill disabled) over the in-query
    sessions table of q_complete_rel_mp: way union (drop-if-missing) →
    J2 backfill → collection tiles (J3; one nesting level, so the fixed
    point is a single join) → J5/J6 down-propagation for MULTIPOLYGON
    (even-custkey) collections only."""
    return _oracle_session_cte().replace(
        "SELECT l_orderkey AS way_id",
        f"SELECT l_orderkey + {R1} AS way_id",
    ) + f""",
nodes_aug AS (
  SELECT element_id, tile_x, tile_y FROM nodes
  UNION ALL
  SELECT o.member_id AS element_id, w.tile_x, w.tile_y
  FROM ok o JOIN wt w ON o.way_id = w.way_id
),
rm AS (SELECT o_custkey + {R2} AS relation_id, o_orderkey + {R1} AS member_id,
              (o_custkey % 2 = 0) AS is_mp
       FROM orders WHERE o_custkey < {REL_CUST_LIMIT}),
rt AS (SELECT DISTINCT rm.relation_id, wt.tile_x, wt.tile_y
       FROM rm JOIN wt ON rm.member_id = wt.way_id),
inh AS (SELECT rm.member_id AS element_id, rt.tile_x, rt.tile_y
        FROM rm JOIN rt ON rm.relation_id = rt.relation_id
        WHERE rm.is_mp),
aug AS (SELECT m.member_id AS element_id, i.tile_x, i.tile_y
        FROM inh i JOIN members m ON i.element_id = m.way_id)
SELECT DISTINCT element_id, tile_x, tile_y FROM (
  SELECT element_id, tile_x, tile_y FROM nodes_aug
  UNION ALL SELECT way_id, tile_x, tile_y FROM wt
  UNION ALL SELECT relation_id, tile_x, tile_y FROM rt
  UNION ALL SELECT * FROM inh
  UNION ALL SELECT * FROM aug
) u
"""


def _modified_tiles_sessions_oracle() -> str:
    """Recursive-CTE mirror of propagate_newer over the two-level
    membership graph: a vertex is 'newer' if it is a post-watermark
    event or any member (transitively) is — then every modified group's
    FULL tile set is emitted (reference: entity-level modified marking,
    MapSplit.java:435-437).  CTE list is FLAT (assignment as a sibling
    CTE, not nested) — DuckDB's WITH RECURSIVE rejects a nested WITH
    inside a CTE body."""
    assign = sqlgen.assign_cte_sql(
        "(SELECT event_id, " + EV_LON + " AS lon, " + EV_LAT + " AS lat FROM events) ev",
        "event_id", "lon", "lat", ZOOM, BORDER,
    )
    return f"""WITH RECURSIVE
asn AS ({assign}),
nodes AS ({sqlgen.expand_select_sql('asn')}),
members AS (SELECT l_orderkey + {R1} AS way_id, {NID} AS member_id FROM lineitem),
node_ids AS (SELECT DISTINCT element_id FROM nodes),
bad AS (
  SELECT DISTINCT m.way_id FROM members m
  LEFT JOIN node_ids n ON m.member_id = n.element_id
  WHERE n.element_id IS NULL
),
ok AS (SELECT m.* FROM members m WHERE m.way_id NOT IN (SELECT way_id FROM bad)),
wt AS (
  SELECT DISTINCT o.way_id, n.tile_x, n.tile_y
  FROM ok o JOIN nodes n ON o.member_id = n.element_id
),
cols AS (SELECT o_custkey + {R2} AS cid, o_orderkey + {R1} AS mid
         FROM orders WHERE o_custkey < {REL_CUST_LIMIT}),
ct AS (SELECT DISTINCT c.cid AS element_id, w.tile_x, w.tile_y
       FROM cols c JOIN wt w ON c.mid = w.way_id),
edges AS (
  SELECT way_id AS g, member_id AS m FROM members
  UNION ALL
  SELECT cid AS g, mid AS m FROM cols
),
newer(v) AS (
  SELECT event_id FROM events WHERE ts > TIMESTAMP '{WATERMARK}'
  UNION
  SELECT e.g FROM edges e JOIN newer n ON e.m = n.v
)
SELECT element_id, tile_x, tile_y FROM (
  SELECT way_id AS element_id, tile_x, tile_y FROM wt
  UNION ALL
  SELECT element_id, tile_x, tile_y FROM ct
) gt WHERE element_id IN (SELECT v FROM newer)
"""


def _complete_rel_oracle() -> str:
    return _oracle_session_cte().replace(
        "SELECT l_orderkey AS way_id",
        f"SELECT l_orderkey + {R1} AS way_id",
    ) + f""",
rm AS (SELECT o_custkey + {R2} AS relation_id, o_orderkey + {R1} AS member_id
       FROM orders WHERE o_custkey < {REL_CUST_LIMIT}),
rt AS (SELECT DISTINCT rm.relation_id, wt.tile_x, wt.tile_y
       FROM rm JOIN wt ON rm.member_id = wt.way_id),
inh AS (SELECT rm.member_id AS element_id, rt.tile_x, rt.tile_y
        FROM rm JOIN rt ON rm.relation_id = rt.relation_id),
aug AS (SELECT m.member_id AS element_id, i.tile_x, i.tile_y
        FROM inh i JOIN members m ON i.element_id = m.way_id)
SELECT DISTINCT element_id, tile_x, tile_y FROM (
  SELECT element_id, tile_x, tile_y FROM nodes
  UNION ALL SELECT * FROM inh
  UNION ALL SELECT * FROM aug
) u
"""


def _ring_zonal_oracle() -> str:
    """40 unrolled per-ring even-odd aggregates (ring_pip_sql formula
    text shared with the clip gates; the per-zone UNION ALL plan is the
    oracle's own)."""
    holes = " OR ".join(
        sqlgen.ring_pip_sql("lon", "lat", r) for r in CLIP_MULTI_HOLES
    )
    per_zone = " UNION ALL ".join(
        f"SELECT {i} AS zone, CAST(count(*) AS BIGINT) AS n_points, "
        f"CAST(sum(event_id) AS BIGINT) AS id_sum FROM p "
        f"WHERE ({sqlgen.ring_pip_sql('lon', 'lat', ring)}) "
        f"AND NOT ({holes}) HAVING count(*) > 0"
        for i, ring in enumerate(CLIP_MULTI_OUTERS)
    )
    return (
        f"WITH p AS (SELECT event_id, {EV_LON} AS lon, {EV_LAT} AS lat "
        f"FROM events) {per_zone}"
    )


def _way_geometry_oracle() -> str:
    """Shared-formula (haversine/quantization text) lead()+GROUP BY
    restatement — operators/geometry.py::polyline_stats_sql."""
    from mapsplit_spark.operators.geometry import polyline_stats_sql

    return polyline_stats_sql(
        f"(SELECT l_orderkey AS way_id, l_linenumber AS seq, "
        f"{sqlgen.derived_lon_sql(NID)} AS lon, "
        f"{sqlgen.derived_lat_sql(NID)} AS lat FROM lineitem) nv",
        "way_id", "seq", "lon", "lat",
    )


def oracle_sql() -> dict[str, str]:
    nodes = _events_nodes_cte()
    hav = sqlgen.haversine_sql("q_lat", "q_lon", "p_lat", "p_lon")
    qk = "(n_nationkey * 37 + 11)"
    dot_qc = sqlgen.dot_sql("q_vec", "c_vec", EMB_DIM, one_based=True)
    dot_qq = sqlgen.dot_sql("q_vec", "q_vec", EMB_DIM, one_based=True)
    dot_cc = sqlgen.dot_sql("c_vec", "c_vec", EMB_DIM, one_based=True)
    toks = "string_split_regex(trim(text), '\\s+')"
    padded = "(' ' || regexp_replace(trim(text), '\\s+', ' ', 'g') || ' ')"
    n_stop = " + ".join(
        f"(len(str_split({padded}, ' {w} ')) - 1)" for w in textstats.STOPWORDS
    )
    oracles = {
        "tile_assign": _oracle_tile_assign(),
        "tile_assign_border": f"SELECT element_id, tile_x, tile_y FROM ({nodes}) z",
        "tile_counts": (
            f"SELECT tile_x, tile_y, count(*) AS n FROM ({nodes}) z GROUP BY 1, 2"
        ),
        "tile_manifest": f"""
SELECT {ZOOM} AS zoom, tile_x, tile_y,
       array_to_string(list_sort(list(DISTINCT element_id)), ',') AS ids,
       count(DISTINCT element_id) AS n
FROM ({nodes}) z GROUP BY tile_x, tile_y
""",
        "modified_tiles": f"""
WITH pts AS (
  SELECT event_id, {EV_LON} AS lon, {EV_LAT} AS lat FROM events
  WHERE ts > TIMESTAMP '{WATERMARK}'
)
SELECT DISTINCT tile_x, tile_y FROM (
  {sqlgen.expand_union_sql(sqlgen.assign_cte_sql('pts', 'event_id', 'lon', 'lat', ZOOM, BORDER))}
) z
""",
        "latest_ts": (
            "SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts, "
            "count(*) AS n_events FROM events"
        ),
        "bounds_union": f"""
SELECT ROUND(min({EV_LON}), 6) AS min_lon, ROUND(max({EV_LON}), 6) AS max_lon,
       ROUND(min({EV_LAT}), 6) AS min_lat, ROUND(max({EV_LAT}), 6) AS max_lat
FROM events
""",
        "session_tiles": _oracle_session_cte() + "SELECT way_id, tile_x, tile_y FROM wt",
        "modified_tiles_sessions": _modified_tiles_sessions_oracle(),
        "tile_pyramid": f"""
WITH nodes AS ({nodes})
""" + "\nUNION ALL\n".join(
            f"""SELECT {ZOOM - d} AS zoom,
       CAST(FLOOR(tile_x / {float(1 << d)!r}) AS BIGINT) AS tile_x,
       CAST(FLOOR(tile_y / {float(1 << d)!r}) AS BIGINT) AS tile_y,
       count(DISTINCT element_id) AS n
FROM nodes GROUP BY 1, 2, 3"""
            for d in range(ZOOM - PYRAMID_MIN_ZOOM + 1)
        ),
        "clip_ring": _clip_ring_oracle(),
        "relation_tiles": _relation_cte() + """
SELECT DISTINCT element_id, tile_x, tile_y FROM (
  SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
) u
""",
        "complete_rel": _complete_rel_oracle(),
        "complete_rel_mp": _complete_rel_mp_oracle(),
        "tile_cellid": f"""
WITH tiles AS (SELECT DISTINCT tile_x, tile_y FROM ({nodes}) z)
SELECT tile_x, tile_y,
       {sqlgen.morton_sql('tile_x', 'tile_y')} AS morton,
       {sqlgen.quadkey_sql('tile_x', 'tile_y', ZOOM)} AS quadkey
FROM tiles
""",
        "mbtiles_rows": f"""
SELECT {ZOOM} AS zoom_level,
       tile_x AS tile_column,
       CAST(POWER(2.0, {ZOOM}) AS BIGINT) - tile_y - 1 AS tile_row,
       '{{"ids":[' || array_to_string(list_sort(list(DISTINCT element_id)), ',')
                   || '],"n":' || count(DISTINCT element_id) || '}}' AS tile_data
FROM ({nodes}) z GROUP BY tile_x, tile_y
""",
        "lsh_near_dup": f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
s AS (
  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         i -> array_to_string(toks[i:i+2], ' '))) AS sh FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.9
""",
        "tile_bounds": f"""
WITH tiles AS (SELECT DISTINCT tile_x, tile_y FROM ({nodes}) z)
SELECT tile_x, tile_y,
  ROUND(GREATEST({sqlgen.tile2lon_sql('tile_x', ZOOM)} - {BORDER!r} * ({sqlgen.tile2lon_sql('tile_x + 1', ZOOM)} - {sqlgen.tile2lon_sql('tile_x', ZOOM)}), -180.0), 9) AS b_left,
  ROUND(LEAST({sqlgen.tile2lon_sql('tile_x + 1', ZOOM)} + {BORDER!r} * ({sqlgen.tile2lon_sql('tile_x + 1', ZOOM)} - {sqlgen.tile2lon_sql('tile_x', ZOOM)}), 180.0), 9) AS b_right,
  ROUND(LEAST({sqlgen.tile2lat_sql('tile_y', ZOOM)} - {BORDER!r} * ({sqlgen.tile2lat_sql('tile_y + 1', ZOOM)} - {sqlgen.tile2lat_sql('tile_y', ZOOM)}), 85.0511), 9) AS b_top,
  ROUND(GREATEST({sqlgen.tile2lat_sql('tile_y + 1', ZOOM)} + {BORDER!r} * ({sqlgen.tile2lat_sql('tile_y + 1', ZOOM)} - {sqlgen.tile2lat_sql('tile_y', ZOOM)}), -85.0511), 9) AS b_bottom
FROM tiles
""",
        "clip_convex": f"""
WITH pts AS (
  SELECT event_id, {EV_LON} AS lon, {EV_LAT} AS lat FROM events
),
inside AS (
  SELECT * FROM pts WHERE {sqlgen.convex_pip_sql('lon', 'lat', CLIP_QUAD)}
)
SELECT element_id, tile_x, tile_y FROM (
  {sqlgen.assign_cte_sql('inside', 'event_id', 'lon', 'lat', ZOOM, 0.0)}
) z
""",
        # session_holefill: scattered driver sessions enclose nothing
        # (their contribution = the session union, SQL-expressible); the
        # RING_GROUPS fixture contributes members + deterministic holes,
        # embedded as a VALUES table — a real fill, value-hash-gated
        "session_holefill": _oracle_session_cte() + f"""
SELECT way_id, tile_x, tile_y FROM wt
UNION ALL
SELECT * FROM (VALUES {_ring_values()}) v(way_id, tile_x, tile_y)
""",
        "node_backfill": _oracle_session_cte() + """
SELECT DISTINCT element_id, tile_x, tile_y FROM (
  SELECT o.member_id AS element_id, w.tile_x, w.tile_y
  FROM ok o JOIN wt w ON o.way_id = w.way_id
  UNION ALL
  SELECT element_id, tile_x, tile_y FROM nodes
) u
""",
        "knn": f"""
WITH q AS (
  SELECT CAST(n_nationkey AS BIGINT) AS query_id,
         {sqlgen.derived_lon_sql(qk)} AS q_lon, {sqlgen.derived_lat_sql(qk)} AS q_lat
  FROM nation WHERE n_nationkey < 5
),
p AS (SELECT event_id AS point_id, {EV_LON} AS p_lon, {EV_LAT} AS p_lat FROM events),
d AS (SELECT query_id, point_id, ROUND({hav}, 6) AS dist_km FROM q CROSS JOIN p),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist_km ASC, point_id ASC) AS rnk FROM d)
SELECT query_id, rnk, point_id, dist_km FROM r WHERE rnk <= 5
""",
        "doc_token_stats": f"""
SELECT doc_id,
       CAST(len({toks}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{textstats.BPE_TOKEN_RE.replace(chr(39), chr(39) * 2)}')) AS BIGINT) AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars2,
       ROUND(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
             / len({toks}), 4) AS avg_token_len
FROM documents
""",
        "doc_quality": f"""
SELECT doc_id,
       CAST(len({toks}) AS BIGINT) AS n_tokens,
       ROUND(CAST({n_stop} AS DOUBLE) / len({toks}), 4) AS stopword_ratio,
       ROUND(LEAST(1.0, len({toks}) / 100.0)
             * (1.0 - ROUND(CAST({n_stop} AS DOUBLE) / len({toks}), 4)), 4) AS quality
FROM documents
""",
        "lang_profile": (
            "SELECT lang, source, count(*) AS n_docs, ROUND(avg(n_chars), 4) AS avg_chars "
            "FROM documents GROUP BY lang, source"
        ),
        "doc_exact_dup": """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_doc
FROM documents GROUP BY 1 HAVING count(*) >= 2
""",
        "doc_lang_id": _lang_id_oracle(),
        "doc_winnow": """
WITH nrm AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
),
g AS (
  SELECT doc_id, list_transform(range(1, greatest(length(norm) - 4, 1) + 1),
         i -> md5(substr(norm, i, 5))) AS gh FROM nrm
),
wmins AS (
  SELECT doc_id, list_transform(range(1, greatest(len(gh) - 3, 1) + 1),
         j -> list_min(gh[j:j+3])) AS mins FROM g
)
SELECT doc_id, CAST(len(list_distinct(mins)) AS BIGINT) AS n_fp,
       md5(array_to_string(list_sort(list_distinct(mins)), '')) AS fp_hash
FROM wmins
""",
        "doc_fingerprint": f"""
SELECT md5(array_to_string(list_sort(list_distinct({toks})), ' ')) AS fp,
       count(*) AS n_docs, min(doc_id) AS min_doc
FROM documents GROUP BY 1
""",
        "doc_jaccard_pairs": f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
s AS (
  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         i -> array_to_string(toks[i:i+2], ' '))) AS sh FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.12
""",
        "emb_near_dup": f"""
WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings)
SELECT id_a, id_b,
       ROUND(({sqlgen.dot_sql('va', 'vb', EMB_DIM, one_based=True)}) /
             (SQRT({sqlgen.dot_sql('va', 'va', EMB_DIM, one_based=True)}) *
              SQRT({sqlgen.dot_sql('vb', 'vb', EMB_DIM, one_based=True)})), 6) AS cos_sim
FROM a JOIN b ON id_a < id_b
WHERE ROUND(({sqlgen.dot_sql('va', 'vb', EMB_DIM, one_based=True)}) /
            (SQRT({sqlgen.dot_sql('va', 'va', EMB_DIM, one_based=True)}) *
             SQRT({sqlgen.dot_sql('vb', 'vb', EMB_DIM, one_based=True)})), 6) >= 0.35
""",
        "emb_cosine_topk": f"""
WITH q AS (SELECT vec_id AS qid, embedding AS q_vec FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS cid, embedding AS c_vec FROM embeddings),
s AS (
  SELECT qid, cid, ROUND(({dot_qc}) / (SQRT({dot_qq}) * SQRT({dot_cc})), 6) AS cos_sim
  FROM q CROSS JOIN c WHERE qid <> cid
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rnk FROM s)
SELECT qid, rnk, cid, cos_sim FROM r WHERE rnk <= 3
""",
        # DuckDB's NATIVE ASOF LEFT JOIN — an implementation fully
        # independent of the engine's union+window form.
        "events_asof": """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, c.click_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
        "event_sessions": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(sum(is_new) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS BIGINT) AS session_id FROM o
)
SELECT user_id, session_id, count(*) AS n_events,
       min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us,
       ROUND(sum(value), 6) AS sum_value
FROM s GROUP BY 1, 2
""",
        # The raw inequality join the engine deliberately never plans
        # (its binned equi-join must produce the identical pair set).
        "event_window_join": """
SELECT p.event_id AS purchase_id, p.user_id,
       count(*) AS n_clicks, ROUND(sum(c.value), 6) AS click_value
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts
 AND epoch_us(c.ts) > epoch_us(p.ts) - 3600000000
GROUP BY 1, 2
""",
        "doc_split": f"""
SELECT doc_id,
       CASE WHEN {_PHASH_BUCKET} < 800000 THEN 'train'
            WHEN {_PHASH_BUCKET} < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
        "doc_stratified": f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY {_PHASH_BUCKET} ASC, doc_id ASC) <= 40
""",
        "doc_simhash": f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
  FROM documents
),
v AS (
  SELECT doc_id,
         {', '.join(f'{v} AS v{b}' for b, v in enumerate(_SIMHASH_VOTES))},
         count(*) AS n_tok
  FROM toks GROUP BY doc_id
)
SELECT doc_id, {_SIMHASH_COMBINE} AS simhash, CAST(n_tok AS BIGINT) AS n_tok
FROM v
""",
        # 48 unrolled even-odd ring predicates — the raw per-ring scan
        # the STR-tree path must reproduce exactly
        "clip_strtree": f"""
WITH p AS (SELECT event_id, {EV_LON} AS lon, {EV_LAT} AS lat FROM events)
SELECT event_id FROM p
WHERE ({' OR '.join(sqlgen.ring_pip_sql('lon', 'lat', r) for r in CLIP_MULTI_OUTERS)})
  AND NOT ({' OR '.join(sqlgen.ring_pip_sql('lon', 'lat', r) for r in CLIP_MULTI_HOLES)})
""",
        "user_distinct_hll": f"""
WITH est AS ({sqlgen.hll_estimate_sql(
    'events', ['event_type'],
    "concat(cast(user_id as string), ':', props)", salt='r5')}),
ex AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT concat(cast(user_id as string), ':', props)) AS BIGINT)
           AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT est.event_type, est.n_reg, est.hll_estimate, ex.exact_distinct
FROM est JOIN ex ON est.event_type = ex.event_type
""",
        "doc_weighted_sample": f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY {_WEIGHTED_KEY} DESC, doc_id ASC) <= 25
""",
        "event_quantiles": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.25), 4) AS q25,
       ROUND(quantile_cont(value, 0.50), 4) AS q50,
       ROUND(quantile_cont(value, 0.75), 4) AS q75,
       ROUND(quantile_cont(value, 0.95), 4) AS q95
FROM events GROUP BY event_type
""",
        # quantization arithmetic shared text (FP parity); bit shuffle +
        # alphabet lookup restated as FLOOR/mod + SUBSTR (independent of
        # the engine's shiftright/bitwiseAND/element_at kernel)
        "event_geohash": f"""
WITH p AS (SELECT event_id, {EV_LON} AS lon, {EV_LAT} AS lat FROM events),
g AS (SELECT event_id,
             {sqlgen.geohash_ix_sql('lon', 5)} AS gx5,
             {sqlgen.geohash_iy_sql('lat', 5)} AS gy5,
             {sqlgen.geohash_ix_sql('lon', 8)} AS gx8,
             {sqlgen.geohash_iy_sql('lat', 8)} AS gy8
      FROM p)
SELECT event_id,
       {sqlgen.geohash_chars_sql('gx5', 'gy5', 5)} AS gh5,
       {sqlgen.geohash_chars_sql('gx8', 'gy8', 8)} AS gh8
FROM g
""",
        "lang_top_terms": """
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
c AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY lang, term)
SELECT lang, term, cnt, rk FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rk FROM c
) WHERE rk <= 10
""",
        # GATHER formulation (counts × offsets cross join) vs the
        # engine's map-side SCATTER — equivalent for the symmetric kernel
        "tile_focal": f"""
WITH c AS (
  SELECT tile_x, tile_y, CAST(count(*) AS BIGINT) AS n
  FROM ({_events_nodes_cte()}) z GROUP BY 1, 2
),
offs AS (
  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                        (1,-1),(1,0),(1,1)) AS t(dx, dy)
),
e AS (
  SELECT c.tile_x + offs.dx AS tile_x, c.tile_y + offs.dy AS tile_y, c.n
  FROM c CROSS JOIN offs
  WHERE c.tile_x + offs.dx >= 0 AND c.tile_x + offs.dx < {1 << ZOOM}
    AND c.tile_y + offs.dy >= 0 AND c.tile_y + offs.dy < {1 << ZOOM}
)
SELECT tile_x, tile_y, CAST(SUM(n) AS BIGINT) AS focal_sum,
       CAST(COUNT(*) AS BIGINT) AS n_contrib
FROM e GROUP BY tile_x, tile_y
""",
        # |dense|² theta-join adjacency + WITH RECURSIVE reachability —
        # vs the engine's scatter/equi-join + pointer-jumping fixpoint
        "tile_clusters": f"""
WITH RECURSIVE
a AS ({sqlgen.assign_cte_sql(
    "(SELECT event_id, " + EV_LON + " AS lon, " + EV_LAT
    + " AS lat FROM events) ev",
    "event_id", "lon", "lat", CLUSTER_ZOOM, 0.0)}),
c AS (SELECT tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS n
      FROM a GROUP BY 1, 2),
d AS (SELECT tile_x, tile_y, n,
             CAST(tile_x AS BIGINT) * {1 << CLUSTER_ZOOM} + tile_y AS k
      FROM c WHERE n >= (SELECT greatest(2, CAST(floor(count(*) / {CLUSTER_DENOM}.0) AS BIGINT)) FROM events)),
e AS (SELECT x.k AS src, y.k AS dst FROM d x JOIN d y
      ON abs(x.tile_x - y.tile_x) <= 1 AND abs(x.tile_y - y.tile_y) <= 1
         AND x.k <> y.k),
reach(v, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.v
),
comp AS (SELECT v, MIN(r) AS component FROM reach GROUP BY v)
SELECT d.tile_x, d.tile_y, d.n, COALESCE(comp.component, d.k) AS cluster
FROM d LEFT JOIN comp ON d.k = comp.v
""",
        "term_cms": sqlgen.cms_gate_sql(
            "(SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) "
            "AS term FROM documents) tk",
            "term",
            "(SELECT DISTINCT unnest(regexp_extract_all(lower(text), "
            "'[a-z]+')) AS term FROM documents WHERE doc_id % 101 = 7) pk",
            "term",
            depth=CMS_DEPTH,
        ),
        "way_geometry": _way_geometry_oracle(),
        # doc_winnow's list CTE kept EXPLODED, then df-filter + split +
        # fp equi-join — the engine's operator never sees this SQL
        "doc_contamination": r"""
WITH nrm AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
g AS (
  SELECT doc_id, list_transform(range(1, greatest(length(norm) - 4, 1) + 1),
         i -> md5(substr(norm, i, 5))) AS gh FROM nrm
),
wmins AS (
  SELECT doc_id, list_transform(range(1, greatest(len(gh) - 3, 1) + 1),
         j -> list_min(gh[j:j+3])) AS mins FROM g
),
fp AS (SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM wmins),
keep AS (SELECT fp FROM (SELECT fp, count(*) AS c FROM fp GROUP BY 1)
         WHERE c <= 20),
fpk AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp)),
t AS (SELECT * FROM fpk WHERE doc_id % 5 = 0),
r AS (SELECT * FROM fpk WHERE doc_id % 5 <> 0)
SELECT t.doc_id AS test_id, r.doc_id AS train_id,
       CAST(count(*) AS BIGINT) AS n_shared
FROM t JOIN r ON t.fp = r.fp
GROUP BY 1, 2 HAVING count(*) >= 2
""",
        "ring_zonal": _ring_zonal_oracle(),
        # same ASCII token regex as textstats.TFIDF_TOKEN_RE; rank on
        # the ROUNDED score in both engines (tie-break term ASC)
        "doc_tfidf": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / dfr.df), 4) AS tfidf
  FROM tf JOIN dfr ON tf.term = dfr.term CROSS JOIN n
),
r AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk FROM s)
SELECT doc_id, term, tf, tfidf, rk FROM r WHERE rk <= 3
""",
    }
    # pruned-probe ANN over the derived clustered vectors: the oracle is
    # the EXACT cosine top-k on the same vectors (separation argument in
    # sqlgen.clustered_vec_elem_sql makes pruning provably lossless)
    celems = ", ".join(_clustered_elems())
    oracles["emb_ann_pruned"] = f"""
WITH e AS (SELECT vec_id, list_value({celems}) AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS q_vec FROM e WHERE vec_id < 20),
c AS (SELECT vec_id AS cid, v AS c_vec FROM e),
s AS (
  SELECT qid, cid, ROUND(({dot_qc}) / (SQRT({dot_qq}) * SQRT({dot_cc})), 6) AS cos_sim
  FROM q CROSS JOIN c WHERE qid <> cid
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rnk FROM s)
SELECT qid, rnk, cid, cos_sim FROM r WHERE rnk <= 3
"""
    # pHash near-dup: independent brute-force oracle — all-pairs join +
    # arithmetic per-band popcount (no banding, no packing, no bit ops),
    # vs the engine's shiftright/mask band join + bit_count(xor)
    pb = [sqlgen.derived_phash_band_sql("doc_id", k) for k in range(4)]
    ham = " + ".join(sqlgen.hamming_bits_sql(f"a.b{k}", f"b.b{k}", 15) for k in range(4))
    oracles["phash_near_dup"] = f"""
WITH h AS (
  SELECT doc_id, {pb[0]} AS b0, {pb[1]} AS b1, {pb[2]} AS b2, {pb[3]} AS b3
  FROM documents
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, ({ham}) AS hamming
  FROM h a JOIN h b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
"""
    # connected components over the pHash pairs: declarative transitive
    # closure (WITH RECURSIVE reachability) vs the engine's iterative
    # min-label/pointer-jumping fixpoint
    phash_pairs_ctes = f"""
h AS (
  SELECT doc_id, {pb[0]} AS b0, {pb[1]} AS b1, {pb[2]} AS b2, {pb[3]} AS b3
  FROM documents
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM h a JOIN h b ON a.doc_id < b.doc_id
  WHERE ({ham}) <= 3
),
e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
reach(v, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.v
),
comp AS (SELECT v, MIN(r) AS component FROM reach GROUP BY v)
"""
    oracles["dup_components"] = (
        "WITH RECURSIVE " + phash_pairs_ctes
        + "SELECT v AS doc_id, component FROM comp"
    )
    oracles["doc_dedup_keep"] = (
        "WITH RECURSIVE " + phash_pairs_ctes
        + "SELECT doc_id FROM documents "
        + "WHERE doc_id NOT IN (SELECT v FROM comp WHERE v <> component)"
    )
    # hex cell ids: sqlgen cube-round formulation (arithmetic text
    # shared for FP parity; the independent check is the nearest-center
    # brute force in tests/test_hexgrid.py)
    hqc, hrc = sqlgen.hex_qr_sql("lon", "lat", HEX_S_COARSE)
    hqf, hrf = sqlgen.hex_qr_sql("lon", "lat", HEX_S_FINE)
    oracles["event_hexcell"] = f"""
WITH p AS (SELECT event_id, {EV_LON} AS lon, {EV_LAT} AS lat FROM events)
SELECT event_id, {hqc} AS hq_c, {hrc} AS hr_c,
       {hqf} AS hq_f, {hrf} AS hr_f
FROM p
"""
    # hex-ring kNN is EXACT by the coverage-proof ladder (brute-force
    # tail), so its oracle is the exact-kNN SQL over its own query set
    qk2 = "(n_nationkey * 53 + 7)"
    hav_knn = sqlgen.haversine_sql("q_lat", "q_lon", "p_lat", "p_lon")
    oracles["knn_hex"] = f"""
WITH q AS (
  SELECT CAST(n_nationkey AS BIGINT) AS query_id,
         {sqlgen.derived_lon_sql(qk2)} AS q_lon, {sqlgen.derived_lat_sql(qk2)} AS q_lat
  FROM nation WHERE n_nationkey < 5
),
p AS (SELECT event_id AS point_id, {EV_LON} AS p_lon, {EV_LAT} AS p_lat FROM events),
d AS (SELECT query_id, point_id, ROUND({hav_knn}, 6) AS dist_km FROM q CROSS JOIN p),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist_km ASC, point_id ASC) AS rnk FROM d)
SELECT query_id, rnk, point_id, dist_km FROM r WHERE rnk <= 5
"""
    # DWithin: brute-force O(n²) restatement on the same subset; the
    # ROUND-then-compare matches the engine's refine exactly (the
    # distance expression text is shared, so boundary pairs agree)
    hav_dw = sqlgen.haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    oracles["points_dwithin"] = f"""
WITH p AS (SELECT event_id AS pid, {EV_LON} AS lon, {EV_LAT} AS lat
           FROM events WHERE event_id % {DWITHIN_MOD} = 0)
SELECT a.pid AS id_a, b.pid AS id_b, ROUND({hav_dw}, 6) AS dist_km
FROM p a JOIN p b ON a.pid < b.pid
WHERE ROUND({hav_dw}, 6) <= {DWITHIN_KM!r}
"""
    rz_n = 1 << RASTER_ZOOM
    rz_d = 1 << (ZOOM - RASTER_ZOOM)
    rz_members = "\n  UNION ALL ".join(
        f"SELECT {i} AS zone, x, y FROM c WHERE "
        + sqlgen.ring_pip_sql("lon", "lat", ring)
        for i, ring in enumerate(CLIP_MULTI_OUTERS)
    )
    rz_assign = sqlgen.assign_cte_sql(
        "(SELECT event_id, " + EV_LON + " AS lon, " + EV_LAT
        + " AS lat FROM events) evp",
        "event_id", "lon", "lat", ZOOM, 0.0,
    )
    oracles["ring_raster"] = f"""
WITH g AS (SELECT gx.x AS x, gy.y AS y
           FROM generate_series(0, {rz_n - 1}) gx(x),
                generate_series(0, {rz_n - 1}) gy(y)),
c AS (SELECT x, y, {sqlgen.tile2lon_sql('x + 0.5', RASTER_ZOOM)} AS lon,
             {sqlgen.tile2lat_sql('y + 0.5', RASTER_ZOOM)} AS lat FROM g),
m AS (
  {rz_members}
),
ev AS (SELECT CAST(FLOOR(tile_x / {rz_d}.0) AS BIGINT) AS x,
              CAST(FLOOR(tile_y / {rz_d}.0) AS BIGINT) AS y
       FROM ({rz_assign}) z),
t AS (SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_tiles FROM m GROUP BY zone),
e2 AS (SELECT m.zone, CAST(COUNT(*) AS BIGINT) AS n_events
       FROM ev JOIN m ON ev.x = m.x AND ev.y = m.y GROUP BY m.zone)
SELECT CAST(t.zone AS INT) AS zone, t.n_tiles,
       CAST(COALESCE(e2.n_events, 0) AS BIGINT) AS n_events
FROM t LEFT JOIN e2 ON t.zone = e2.zone
"""
    from mapsplit_spark.operators.snap import snap_dist_sql
    snap_d = snap_dist_sql("plon", "plat", "x1", "y1", "x2", "y2")
    oracles["point_snap"] = f"""
WITH t AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
v AS (SELECT user_id, event_id, rn, {SNAP_VX} AS vx, {SNAP_VY} AS vy FROM t),
s AS (SELECT user_id AS way_id, rn AS seq, vx AS x1, vy AS y1,
             LEAD(vx) OVER (PARTITION BY user_id ORDER BY rn) AS x2,
             LEAD(vy) OVER (PARTITION BY user_id ORDER BY rn) AS y2
      FROM v),
seg AS (SELECT * FROM s WHERE x2 IS NOT NULL),
p AS (SELECT event_id AS pid, {SNAP_PLON} AS plon, {SNAP_PLAT} AS plat
      FROM v WHERE event_id % 5 = 0),
c AS (SELECT pid, way_id, seq, ROUND({snap_d}, 6) AS dist_km
      FROM p CROSS JOIN seg),
f AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY pid ORDER BY dist_km, way_id, seq) AS rk
      FROM c WHERE dist_km <= {SNAP_KM!r})
SELECT pid, way_id, seq, dist_km FROM f WHERE rk = 1
"""
    from mapsplit_spark.operators.interpolate import idw_grid_sql
    oracles["tile_idw"] = idw_grid_sql(
        f"(SELECT event_id, {EV_LON} AS lon, {EV_LAT} AS lat, value"
        " FROM events) ie",
        "event_id", "lon", "lat", "value", RASTER_ZOOM, radius=1,
    )
    zt_least = "LEAST(" + ", ".join(
        f"CASE WHEN {sqlgen.ring_pip_sql('lon', 'lat', ring)} THEN {i} "
        "ELSE 999 END"
        for i, ring in enumerate(CLIP_MULTI_OUTERS)
    ) + ")"
    oracles["zone_transitions"] = f"""
WITH p AS (SELECT user_id, ts, event_id, {EV_LON} AS lon, {EV_LAT} AS lat
           FROM events),
z AS (SELECT user_id, ts, event_id,
             CASE WHEN {zt_least} = 999 THEN -1 ELSE {zt_least} END AS zone
      FROM p),
t AS (SELECT user_id, event_id, CAST(zone AS INT) AS zone,
             CAST(LAG(zone) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS prev_zone
      FROM z)
SELECT user_id, event_id, prev_zone, zone
FROM t WHERE prev_zone IS NOT NULL AND prev_zone <> zone
"""
    oracles["way_rings"] = geometry.ring_stats_sql(
        f"(SELECT l_orderkey AS way_id, l_linenumber AS seq, "
        f"{sqlgen.derived_lon_sql(NID)} AS lon, "
        f"{sqlgen.derived_lat_sql(NID)} AS lat FROM lineitem) wn",
        "way_id", "seq", "lon", "lat",
    )
    oracles["gps_spikes"] = geometry.gps_spikes_sql(
        f"(SELECT user_id, ts, event_id, {EV_LON} AS lon, {EV_LAT} AS lat"
        " FROM events) eg",
        "user_id", "ts", "event_id", "lon", "lat", max_kmh=1000.0,
    )
    oracles["tile_flows"] = geometry.tile_flows_sql(
        f"(SELECT user_id, ts, event_id, {EV_LON} AS lon, {EV_LAT} AS lat"
        " FROM events) ef",
        "user_id", "ts", "event_id", "lon", "lat", zoom=5,
    )
    gd_key = f"CAST(FLOOR(event_id / {DWITHIN_MOD}.0) AS BIGINT)"
    gd_bands = [sqlgen.derived_phash_band_sql(gd_key, k) for k in range(4)]
    gd_hav = sqlgen.haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    # hamming summed PER 15-BIT BAND (hamming_bits_sql's documented
    # domain — a packed 2^60 value would lose low bits in the oracle's
    # double FLOOR-divisions; the engine's bigint bit_count(xor) is the
    # independent formulation)
    gd_ham = " + ".join(
        sqlgen.hamming_bits_sql(f"a.b{k}", f"b.b{k}", 15) for k in range(4))
    gd_band_cols = ",\n         ".join(
        f"{b} AS b{k}" for k, b in enumerate(gd_bands))
    oracles["geo_image_dups"] = f"""
WITH p AS (
  SELECT event_id AS pid,
         {gd_band_cols},
         {EV_LON} AS lon, {EV_LAT} AS lat
  FROM events WHERE event_id % {DWITHIN_MOD} = 0
)
SELECT a.pid AS id_a, b.pid AS id_b,
       CAST({gd_ham} AS INT) AS hamming,
       ROUND({gd_hav}, 6) AS dist_km
FROM p a JOIN p b ON a.pid < b.pid
WHERE {gd_ham} <= 3 AND ROUND({gd_hav}, 6) <= {GEODUP_KM!r}
"""
    oracles["user_heading"] = geometry.heading_stats_sql(
        f"(SELECT user_id, ts, event_id, {EV_LON} AS lon, {EV_LAT} AS lat"
        " FROM events) eh",
        "user_id", "ts", "event_id", "lon", "lat",
    )
    oracles["user_trajectory"] = geometry.trajectory_stats_sql(
        f"(SELECT user_id, ts, event_id, {EV_LON} AS lon, {EV_LAT} AS lat"
        " FROM events) ev",
        "user_id", "ts", "event_id", "lon", "lat",
    )
    # the tile-ring kNN provably covers the exact top-k at z4/ring2 for
    # this density, so its oracle is the exact-kNN SQL itself; likewise
    # full-probe IVF reconstructs the exact top-3
    oracles["knn_tiled"] = oracles["knn"]
    oracles["emb_ann_topk"] = oracles["emb_cosine_topk"]
    # tile_merge's oracle embeds a remap computed from the correctness
    # fixture itself (SPARK_GRAFT_CORRECTNESS_DIR, default sf0.01); when
    # that fixture is absent, omit this one key (the driver records a
    # rows-only check) instead of breaking every oracle-backed gate
    try:
        oracles["tile_merge"] = _tile_merge_oracle()
    except Exception:  # noqa: BLE001 — missing fixture / duckdb quirk
        pass
    return oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tiling pipeline (assign → border expand → salted
    manifest aggregation) over sf0.001 events."""
    return q_tile_manifest(spark, "/root/testdata/sf0.001")
