"""Scale probe for operators/temporal.py: synthesize N deterministic
event rows with spark.range (no external data), run each temporal
operator fully materialized (noop sink), report wall + rows/s.

Usage: python tools/bench_temporal.py [n_rows] [cores]
Defaults: 20_000_000 rows, local[32].  One fresh session; each
operator timed best-of-2 after a warm pass, same protocol as bench.py.

Run on a QUIET machine only (VM contention shows ±27% phantom noise —
BASELINE.md r4 protocol notes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def make_events(spark, n: int, n_users: int):
    """Deterministic synthetic clickstream: id → (user, ts, type, value).
    ts spreads over ~30 days at microsecond grain; type cycles through
    5 values so purchase/click filters hit ~20% each."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        F.timestamp_micros(
            (F.lit(1704067200000000)  # 2024-01-01 UTC, micros
             + (F.col("id") * 7919 + F.col("id") % 104729) % (30 * 86400 * 1000000))
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("click", "view", "purchase", "error", "signup")]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("id") % 1000) / 1000.0).alias("value"),
    )


def main(n: int, cores: int) -> None:
    from mapsplit_spark.operators.temporal import (
        asof_join,
        range_join_binned,
        sessionize_gaps,
    )
    from mapsplit_spark.session import get_spark

    spark = get_spark("bench-temporal", cores=cores,
                      shuffle_partitions=cores)
    ev = make_events(spark, n, n_users=max(n // 2000, 16))
    ev.write.mode("overwrite").parquet("/tmp/bench_temporal_events")
    ev = spark.read.parquet("/tmp/bench_temporal_events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"))
    c_dedup = c.groupBy("user_id", "c_ts").agg(
        F.max("click_id").alias("click_id"))

    jobs = {
        "asof_join": lambda: asof_join(
            p, c_dedup, on="user_id", left_ts="ts", right_ts="c_ts"),
        "sessionize_gaps": lambda: sessionize_gaps(
            ev, "user_id", "ts", gap_s=1800, order_cols=["event_id"]),
        "range_join_binned": lambda: range_join_binned(
            p, c, on="user_id", left_ts="ts", right_ts="c_ts",
            lower_s=-3600, upper_s=0, strict_lower=True),
    }
    out = {"n_rows": n, "cores": cores, "ops": {}}
    _force(ev)  # warm: JVM + parquet footers
    for name, mk in jobs.items():
        _force(mk())  # warm pass (JIT)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(mk())
            best = min(best, time.perf_counter() - t0)
        n_out = mk().count()
        out["ops"][name] = {
            "sec": round(best, 2),
            "rows_in_per_s": round(n / best),
            "rows_out": n_out,
        }
        print(f"{name:20s} {best:8.2f} s  {n / best / 1e6:6.2f} M rows/s in  "
              f"{n_out:>12,d} rows out", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 32)
