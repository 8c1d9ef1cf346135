"""Staged, checkpoint-resumable tiling pipeline with per-partition
lineage + metrics tables (north_rule requirements).

The reference's closest analog is the "appointment date" incremental
mechanism (MapSplit.java:1506-1547); ours is stage-boundary parquet
checkpoints (Iceberg tables on a real cluster — same layout, hidden
partitioning on tile): each stage writes

* ``{workdir}/{stage}/data/``      — the stage output (parquet)
* ``{workdir}/{stage}/metrics/``   — per-partition rows: (stage,
  partition_id, n_rows) + stage wall time, input fingerprint
* ``{workdir}/{stage}/_STAGE_OK``  — completion marker carrying the
  stage's config hash

``run`` skips any stage whose marker matches the current config hash —
kill-and-resume therefore recomputes only unfinished stages and yields
byte-identical manifests (validated by tests/test_pipeline.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.assign import assign_and_expand
from .sinks.manifests import tile_manifests


def _cfg_hash(cfg: dict) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]


def _marker(path: str) -> str:
    return os.path.join(path, "_STAGE_OK")


def _stage_done(stage_dir: str, cfg_hash: str) -> bool:
    m = _marker(stage_dir)
    if not os.path.exists(m):
        return False
    try:
        with open(m) as fh:
            return json.load(fh).get("cfg_hash") == cfg_hash
    except (OSError, json.JSONDecodeError):
        return False


def _write_stage(df: DataFrame, stage: str, stage_dir: str, cfg_hash: str,
                 lineage: dict) -> None:
    t0 = time.time()
    data = os.path.join(stage_dir, "data")
    df.write.mode("overwrite").parquet(data)
    spark = df.sparkSession
    out = spark.read.parquet(data)
    metrics = (
        out.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
        .withColumn("stage", F.lit(stage))
        .withColumn("wall_sec", F.lit(round(time.time() - t0, 3)))
    )
    metrics.write.mode("overwrite").parquet(os.path.join(stage_dir, "metrics"))
    with open(_marker(stage_dir), "w") as fh:
        json.dump({
            "cfg_hash": cfg_hash, "stage": stage, "rows": out.count(),
            "wall_sec": round(time.time() - t0, 3), "lineage": lineage,
            "finished_at_epoch": time.time(),
        }, fh)


class TilingPipeline:
    """assign → [sessions] → [clip] → [optimize] → manifests,
    checkpointed per stage."""

    STAGES = ("assign", "sessions", "clip", "tiled", "manifests")

    def __init__(self, spark: SparkSession, workdir: str, *, zoom: int = 13,
                 border: float = 0.1, id_col: str = "image_id",
                 lon_col: str = "lon", lat_col: str = "lat",
                 poly_path: str | None = None, poly_id: str | None = None,
                 node_limit: int = 0, sessions_path: str | None = None,
                 complete_sessions: bool = False,
                 multipolygon_only: bool = False):
        self.spark = spark
        self.workdir = workdir
        self.cfg = {
            "zoom": zoom, "border": border, "id_col": id_col,
            "lon_col": lon_col, "lat_col": lat_col,
            "poly_path": poly_path, "poly_id": poly_id,
            "node_limit": node_limit, "sessions_path": sessions_path,
            "complete_sessions": complete_sessions,
            "multipolygon_only": multipolygon_only,
        }
        self.cfg_hash = _cfg_hash(self.cfg)
        os.makedirs(workdir, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def stage_data(self, stage: str) -> str:
        """Parquet path of a completed stage's output (public accessor
        for downstream consumers like the CLI)."""
        return os.path.join(self._dir(stage), "data")

    def last_assignment_dir(self) -> str:
        """Stage dir holding the final (element_id, tile_x, tile_y)
        assignment relation — clip if clipping, else sessions, else
        assign (for downstream payload/raster joins)."""
        if self.cfg["poly_path"]:
            return self._dir("clip")
        if self.cfg["sessions_path"]:
            return self._dir("sessions")
        return self._dir("assign")

    def run(self, input_path: str) -> DataFrame:
        """Execute (or resume) the pipeline; returns the manifest table."""
        from pyspark.sql import functions as F

        lineage = {"input": input_path, "cfg": self.cfg}
        assign_dir = self._dir("assign")
        if not _stage_done(assign_dir, self.cfg_hash):
            src = self.spark.read.parquet(input_path).select(
                self.cfg["id_col"], self.cfg["lon_col"], self.cfg["lat_col"]
            )
            pairs = assign_and_expand(
                src, self.cfg["id_col"], self.cfg["lon_col"], self.cfg["lat_col"],
                self.cfg["zoom"], self.cfg["border"],
            )
            _write_stage(pairs, "assign", assign_dir, self.cfg_hash, lineage)
        last_dir = assign_dir

        if self.cfg["sessions_path"]:
            from .operators.sessions import session_assignments

            ses_dir = self._dir("sessions")
            if not _stage_done(ses_dir, self.cfg_hash):
                pairs = self.spark.read.parquet(os.path.join(last_dir, "data"))
                sessions = self.spark.read.parquet(self.cfg["sessions_path"])
                aug = session_assignments(
                    pairs, sessions,
                    complete=self.cfg["complete_sessions"],
                    multipolygon_only=self.cfg["multipolygon_only"],
                )
                _write_stage(aug, "sessions", ses_dir, self.cfg_hash,
                             {**lineage, "upstream": last_dir})
            last_dir = ses_dir

        if self.cfg["poly_path"]:
            from .operators.clip import clip_assignments, clip_tiles, load_rings

            clip_dir = self._dir("clip")
            if not _stage_done(clip_dir, self.cfg_hash):
                pairs = self.spark.read.parquet(os.path.join(last_dir, "data"))
                outers, inners = load_rings(
                    self.spark.read.parquet(self.cfg["poly_path"]), self.cfg["poly_id"]
                )
                kept = clip_tiles(pairs.select("tile_x", "tile_y").distinct(),
                                  outers, inners, self.cfg["zoom"])
                _write_stage(clip_assignments(pairs, kept), "clip", clip_dir,
                             self.cfg_hash, {**lineage, "upstream": last_dir})
            last_dir = clip_dir

        if self.cfg["node_limit"] > 0:
            # the merged output-zoom relation is its own stage: the
            # store/payload path (J7) keys off it, so persisting it here
            # means the CLI never recomputes the merge walk
            from .operators.optimize import merged_assignments

            tiled_dir = self._dir("tiled")
            if not _stage_done(tiled_dir, self.cfg_hash):
                pairs = self.spark.read.parquet(os.path.join(last_dir, "data"))
                merged = merged_assignments(pairs, self.cfg["zoom"],
                                            self.cfg["node_limit"])
                _write_stage(merged, "tiled", tiled_dir, self.cfg_hash,
                             {**lineage, "upstream": last_dir})
            last_dir = tiled_dir

        man_dir = self._dir("manifests")
        if not _stage_done(man_dir, self.cfg_hash):
            rel = self.spark.read.parquet(os.path.join(last_dir, "data"))
            man = tile_manifests(rel, self.cfg["zoom"], assume_distinct=True)
            _write_stage(man, "manifests", man_dir, self.cfg_hash,
                         {**lineage, "upstream": last_dir})
        return self.spark.read.parquet(os.path.join(man_dir, "data"))

    def metrics(self) -> DataFrame:
        paths = [
            os.path.join(self._dir(s), "metrics") for s in self.STAGES
            if os.path.exists(os.path.join(self._dir(s), "metrics"))
        ]
        return self.spark.read.option("mergeSchema", "false").parquet(*paths)
