"""Run one declared query with the noop sink and print per-stage
wall/task-time/IO from the UI REST API — the stage-level drill-down the
optimization loop uses (guide §7.1).  Usage:
  python tools/stage_probe.py <query> [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_EXTRA_UI"] = "1"

    import __spark_entry__ as entry
    from mapsplit_spark.session import get_spark

    spark = get_spark("stage-probe", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app = spark.sparkContext.applicationId
    qs = entry.queries()
    qs["tile_manifest"](spark, sf_dir).limit(1).count()  # warm

    for r in range(repeats):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"run {r}: {time.perf_counter() - t0:.3f} s")

    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/applications/{app}/stages?status=complete"
    ) as resp:
        stages = json.load(resp)
    stages.sort(key=lambda s: s["stageId"])
    for st in stages:
        sub = (st.get("submissionTime") or "")[17:23]
        dur = None
        if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                a = datetime.strptime(st["firstTaskLaunchedTime"], fmt)
                b = datetime.strptime(st["completionTime"], fmt)
                dur = (b - a).total_seconds()
            except ValueError:
                pass
        print(f"stage {st['stageId']:4d} tasks={st['numCompleteTasks']:4d} "
              f"wall={dur if dur is not None else '?':>6} "
              f"task={st.get('executorRunTime', 0) / 1000.0:8.2f}s "
              f"in={st.get('inputBytes', 0) / 1e6:8.1f}MB "
              f"shR={st.get('shuffleReadBytes', 0) / 1e6:7.1f}MB "
              f"shW={st.get('shuffleWriteBytes', 0) / 1e6:7.1f}MB "
              f"rows_out={st.get('outputRecords', 0):>9} sub={sub} {st['name'][:60]}")
    spark.stop()


if __name__ == "__main__":
    main()
