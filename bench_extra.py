"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

``bench.py`` is the frozen driver harness; this file exists so the
optimization loop can (a) time a SUBSET of queries with the noop sink,
(b) dump ``explain("formatted")`` plans into plans/r06/, and (c) record
VM-independent plan-cost telemetry (executor task-time sum + shuffle
bytes) via the Spark UI REST API, which survives this VM's ±27%
wall-clock weather.

Usage:
  python bench_extra.py [--plans SUFFIX] [--repeats N] [query ...]

With no query names, runs the full bench set.  --plans writes
plans/r06/<query>_<SUFFIX>.txt for each query run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _stage_totals(port: int, app_id: str) -> dict[int, dict]:
    out = {}
    for st in _rest(port, f"applications/{app_id}/stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = {
            "task_ms": st.get("executorRunTime", 0),
            "sh_read": st.get("shuffleReadBytes", 0),
            "sh_write": st.get("shuffleWriteBytes", 0),
            "input": st.get("inputBytes", 0),
        }
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:]]
    plans_suffix = None
    repeats = 2
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i:i + 2]
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from mapsplit_spark.session import get_spark

    os.environ["SPARK_EXTRA_UI"] = "1"  # session.py: enables UI for REST telemetry
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=2 * cpus)
    ui_port = None
    try:
        ui_port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    except Exception:
        pass
    app_id = spark.sparkContext.applicationId

    qs = entry.queries()
    if not names:
        # the two labeled n²-brute-force GATE variants are never benched
        # (bench.py's exclusion: doc_jaccard_pairs alone is tens of
        # minutes at sf0.1)
        names = [n for n in qs if n not in ("doc_jaccard_pairs", "emb_near_dup")]
    # warm pass (JIT/codegen + parquet footers), same as bench.py
    qs["tile_manifest"](spark, sf_dir).limit(1).count()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if plans_suffix:
            plan = qs[name](spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                qs[name](spark, sf_dir)._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"), "w") as fh:
                fh.write(plan)
        before = _stage_totals(ui_port, app_id) if ui_port else {}
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        after = _stage_totals(ui_port, app_id) if ui_port else {}
        new = {k: v for k, v in after.items() if k not in before}
        task_ms = sum(v["task_ms"] for v in new.values())
        sh = sum(v["sh_write"] for v in new.values())
        results[name] = {
            "sec": round(best, 3),
            "task_sec_all_repeats": round(task_ms / 1000.0, 2),
            "shuffle_write_mb_all_repeats": round(sh / 1e6, 2),
        }
        print(f"{name:26s} {best:7.3f} s   task {task_ms / 1000.0:8.2f} s   "
              f"shuffle_w {sh / 1e6:9.2f} MB")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": results, "sf_dir": sf_dir, "cores": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
