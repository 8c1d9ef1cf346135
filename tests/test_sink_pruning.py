"""Materialization-layer scale behavior: bucketed tile writes prune at
read time, and null-coordinate rows are dropped at assignment."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from mapsplit_spark.operators.assign import assign_and_expand, with_tile_id
from mapsplit_spark.sinks.manifests import write_tiles

OUT = "/tmp/prune_test_tiles"


def test_bucketed_write_prunes_partitions(spark, images_dir):
    shutil.rmtree(OUT, ignore_errors=True)
    imgs = spark.read.parquet(f"{images_dir}/images.parquet")
    pairs = assign_and_expand(
        imgs.select("image_id", "lon", "lat"), "image_id", "lon", "lat", 13, 0.1
    )
    write_tiles(with_tile_id(pairs, 13), OUT, 13, n_buckets=16)
    back = spark.read.parquet(OUT)
    one = back.filter(F.col("bucket") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must prune at the partition level, not scan+filter
    assert "PartitionFilters: [isnotnull(bucket" in plan.replace("#", "").replace(")", "") or \
           "PartitionFilters: [" in plan and "bucket" in plan.split("PartitionFilters")[1][:80]
    assert one.count() > 0
    # a tile's rows are findable through its bucket (the k-ring read path)
    r = back.first()
    via_bucket = back.filter(
        (F.col("bucket") == r.bucket) & (F.col("tile_x") == r.tile_x)
        & (F.col("tile_y") == r.tile_y)
    ).count()
    assert via_bucket >= 1


def test_null_coordinates_dropped(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 10.0), ("b", None, 10.0), ("c", 10.0, None)],
        "id string, lon double, lat double",
    )
    out = assign_and_expand(df, "id", "lon", "lat", 13, 0.1)
    assert {r.element_id for r in out.collect()} == {"a"}


def test_ivf_corpus_layout_prunes_cells_and_matches_in_memory(spark):
    """write_ivf_corpus + ivf_topk_bucketed (the 100 TB ANN read path):
    the probe-cell IN filter prunes cell directories at PLANNING time,
    and the result equals the in-memory ivf_topk with the same centroid
    model and probe count."""
    import numpy as np

    from mapsplit_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_bucketed,
        train_ivf_centroids,
        write_ivf_corpus,
    )

    dim = 16
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, dim)) * 10
    rows = [(i, [float(x) for x in centers[i % 4] + rng.standard_normal(dim)])
            for i in range(400)]
    vecs = spark.createDataFrame(rows, "vid long, vec array<float>")
    corpus = vecs.select(F.col("vid").alias("cid"), F.col("vec").alias("c_vec"))
    queries = vecs.filter("vid < 8").select(
        F.col("vid").alias("qid"), F.col("vec").alias("q_vec"))

    centroids = train_ivf_centroids(corpus, n_clusters=8, sample_rows=400)
    out = "/tmp/prune_test_ivf"
    shutil.rmtree(out, ignore_errors=True)
    write_ivf_corpus(corpus, centroids, out)

    bucketed = ivf_topk_bucketed(queries, out, centroids, dim, k=3, n_probe=2)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and \
        "ivf_cell" in plan.split("PartitionFilters")[1][:120], \
        "probe-cell filter did not reach the partition level"

    expect = {tuple(r) for r in
              ivf_topk(queries, corpus, dim, k=3, n_clusters=8, n_probe=2,
                       sample_rows=400).collect()}
    assert {tuple(r) for r in bucketed.collect()} == expect


def test_chunked_manifest_union_equals_flat(spark):
    """chunked=True chunk rows union to exactly the flat manifest, skip
    the second exchange, and bound per-row id counts by ~ids/n_salts."""
    from pyspark.sql import functions as F

    from mapsplit_spark.sinks.manifests import tile_manifests

    # one megatile (id%2==0 → tile (7,7)) + scattered tiles
    pairs = spark.range(40_000).select(
        F.col("id").alias("element_id"),
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise((F.col("id") % 50).cast("int")).alias("tile_x"),
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(((F.col("id") * 3) % 50).cast("int")).alias("tile_y"),
    )
    flat = tile_manifests(pairs, 13, n_salts=16, assume_distinct=True)
    chunked = tile_manifests(pairs, 13, n_salts=16, assume_distinct=True, chunked=True)

    flat_ids = {(r.tile_x, r.tile_y): sorted(r.element_ids) for r in flat.collect()}
    got = {}
    max_chunk = 0
    for r in chunked.collect():
        got.setdefault((r.tile_x, r.tile_y), []).extend(r.element_ids)
        max_chunk = max(max_chunk, len(r.element_ids))
    assert {k: sorted(v) for k, v in got.items()} == flat_ids
    # megatile has 20k ids; chunks stay ~1/16 of that
    assert max_chunk < 20_000 // 8
    # one exchange only (no final flatten shuffle) — check a fresh plan:
    # the executed df's adaptive final plan prints each shuffle stage
    # twice (stage + reuse), inflating a string count
    fresh = tile_manifests(pairs, 13, n_salts=16, assume_distinct=True,
                           chunked=True)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
