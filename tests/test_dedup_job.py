"""CLI e2e for jobs/dedup_job.py — the pHash near-dup pipeline over the
images fixture: pairs/components/kept outputs self-consistent and the
kept corpus contains exactly one representative per dup group."""

from __future__ import annotations

import json
import os

import pytest

from jobs.dedup_job import main as dedup_main


@pytest.fixture(scope="module")
def dup_images(spark, images_dir, tmp_path_factory):
    """Images fixture plus planted exact-phash duplicates (same bytes →
    same phash) so the pipeline has real groups to resolve."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{images_dir}/images.parquet").limit(60)
    clones = (
        base.limit(10)
        .withColumn("image_id", F.concat(F.lit("dup_"), "image_id"))
    )
    out = str(tmp_path_factory.mktemp("dj") / "images.parquet")
    base.unionByName(clones).write.parquet(out)
    return out


def test_dedup_job_e2e(spark, dup_images, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("dj_out"))
    dedup_main([
        "--input", dup_images, "--output", out,
        "--radius", "3", "--bands", "4", "--bits", "64", "--keep",
    ])
    summary = json.loads(
        [ln for ln in capsys.readouterr().out.strip().splitlines()
         if ln.startswith("{")][-1]
    )
    assert summary["pairs"] >= 10          # each clone pairs with its source
    assert summary["dup_groups"] >= 10
    assert summary["kept"] == 70 - summary["dup_members"] + summary["dup_groups"]

    comp = spark.read.parquet(os.path.join(out, "components"))
    kept = spark.read.parquet(os.path.join(out, "kept"))
    kept_ids = {r.image_id for r in kept.select("image_id").collect()}
    # exactly the component representatives survive from dup groups
    for r in comp.collect():
        assert (r.v in kept_ids) == (r.v == r.component)
    # every planted clone is in a pair with its source (hamming 0)
    pairs = spark.read.parquet(os.path.join(out, "pairs"))
    zero = pairs.filter("hamming = 0").count()
    assert zero >= 10


def test_dedup_job_auto_bands_and_ann_recall(spark, images_dir, tmp_path, capsys):
    """Default --bands 0 self-sizes (reported in the summary) and
    --embeddings adds pruned-IVF recall telemetry (a number in [0, 1])."""
    import json
    import os

    from jobs.dedup_job import main as dedup_main

    out = str(tmp_path / "auto")
    dedup_main([
        "--input", f"{images_dir}/images.parquet",
        "--output", out,
        "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
        "--ann-queries", "10", "--ann-probe", "16", "--ann-clusters", "16",
        "--cores", "8",
    ])
    summary = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                          if ln.startswith("{")][-1])
    assert summary["bands"] == 4  # 200-row fixture → radius+1
    assert summary["ann_recall"] is not None
    assert 0.0 <= summary["ann_recall"] <= 1.0
    # full-probe recall on this fixture is exact
    assert summary["ann_recall"] == 1.0
    assert os.path.exists(os.path.join(out, "pairs"))
