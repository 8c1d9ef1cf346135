"""SparkSession factory with the engine's default tuning.

Local testing runs on ``local[N]`` but every default here is chosen for
the 1000-executor / 100 TB target: AQE on (runtime partition coalescing
+ skew-join splitting), shuffle partitions sized per-core locally and
overridable via env for cluster runs, Arrow enabled for the few
pandas-UDF operators (hole-fill, mosaic assembly).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "mapsplit-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cores, 32)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing sizes partitions by BYTES; operators that put
        # expensive per-row compute above a small shuffle instead carry a
        # targeted explicit repartition (measured r6: a global 64k floor
        # halved point_snap/tile_cellid but regressed the fragmentation-
        # sensitive queries 15-30% — per-operator beats global here).
        # Env knob kept for experiments only; default = Spark default.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION", "1m"))
        # preferSortMergeJoin=false (shuffled-hash where it fits, guide
        # §3.1/§9) was A/B'd in r6 and NOT adopted: isolated 6-round
        # medians on the five SMJ-bearing queries improved −4..−11%, but
        # 12 position-counterbalanced FULL-suite runs of the frozen bench
        # showed no effect distinguishable from this VM's window drift
        # (min-of-6 totals +2.9% against, first/second-position splits
        # +15.6%/−5.1% — the window, not the config).  SMJ also spills
        # gracefully where SHJ risks a build-side OOM at 100 TB, so the
        # default stays; env knob for cluster re-measurement.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # NOTE on spark.sql.codegen.hugeMethodLimit: we measured (r4,
        # BASELINE.md "codegen vs JIT") that lowering it to HotSpot's
        # 8 KB JIT threshold speeds giant-single-expression stages 3×
        # (the whole-stage method never JITs above 8 KB) but REGRESSES
        # stages where only one helper method exceeds the limit and the
        # rest JIT fine (doc_quality +60%, tile_cellid +28%).  Kept at
        # the Spark default; hot pair-scan expressions are instead kept
        # small by construction (similarity.dot_pair: one dot per pair).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # UI off by default (driver bench); SPARK_EXTRA_UI=1 turns it on so
        # bench_extra.py can read per-stage task-time/shuffle-bytes telemetry
        # from the REST API (guide §7.1) without touching the frozen bench
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_EXTRA_UI") else "false")
        .getOrCreate()
    )
