"""north_rule launch-mode e2e: `spark-submit --py-files mapsplit_spark.zip
jobs/split_job.py` on a MULTI-EXECUTOR master (local-cluster — separate
executor JVMs with their own python workers).  The sessions path forces
executor-side Python (hole-fill applyInPandas), so the zip genuinely has
to ship the package to the executors: PYTHONPATH is scrubbed from the
subprocess env and the worker processes never see /root/repo."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_multi_executor(spark, images_dir, tmp_path):
    zip_base = str(tmp_path / "mapsplit_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="mapsplit_spark")

    out = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}  # executors must import from the zip
    cmd = [
        "spark-submit", "--master", "local-cluster[2,2,1200]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.executor.memory=1g",
        "--conf", f"spark.pyspark.python={sys.executable}",
        "--py-files", zip_base + ".zip",
        os.path.join(REPO, "jobs", "split_job.py"),
        "--input", f"{images_dir}/images.parquet",
        "--output", out,
        "--sessions", f"{images_dir}/sessions.parquet", "--complete-sessions",
        "--zoom", "13", "--border", "0.1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                          env=env, cwd=str(tmp_path))
    summary_lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert proc.returncode == 0 and summary_lines, proc.stderr[-2000:]
    summary = json.loads(summary_lines[-1])
    assert summary["tiles"] > 0

    # the 2-executor submit run must produce the SAME manifests as the
    # in-process operator pipeline
    from pyspark.sql import functions as F

    from mapsplit_spark.operators.assign import assign_and_expand
    from mapsplit_spark.operators.sessions import session_assignments

    imgs = spark.read.parquet(f"{images_dir}/images.parquet")
    pairs = assign_and_expand(imgs.select("image_id", "lon", "lat"),
                              "image_id", "lon", "lat", 13, 0.1)
    expect = session_assignments(
        pairs, spark.read.parquet(f"{images_dir}/sessions.parquet"), complete=True
    )
    man = spark.read.parquet(os.path.join(out, "manifests"))
    got = man.select("tile_x", "tile_y", F.explode("element_ids").alias("element_id"))
    assert {tuple(r) for r in got.collect()} == \
        {(r.tile_x, r.tile_y, r.element_id) for r in expect.collect()}
    assert summary["tiles"] == man.count()
