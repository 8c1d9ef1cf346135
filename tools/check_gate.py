"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir; compare row count, column names, and an
order-insensitive value hash.  Usage: python tools/check_gate.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon:
        h.update(repr(r).encode())
    return h.hexdigest()


def _norm(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def main(sf_dir: str, only: list[str] | None = None):
    # the tile_merge oracle embeds a remap computed from the SAME dir
    # the Spark queries run on — point it at ours before building oracles
    os.environ["SPARK_GRAFT_CORRECTNESS_DIR"] = sf_dir

    import __spark_entry__ as entry
    from mapsplit_spark.session import get_spark

    spark = get_spark("gate-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {e}"))
            print(f"{name:24s} SPARK ERROR: {e}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(rows):7d}  (rows-only check, no oracle)")
            continue
        try:
            o = con.sql(oracles[name])
            ocols = [c for c in o.columns]
            orows = o.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR {e}"))
            print(f"{name:24s} DUCKDB ERROR: {e}")
            continue
        ok_count = len(rows) == len(orows)
        ok_schema = sorted(cols) == sorted(ocols)
        ok_hash = ok_schema and value_hash(rows, cols) == value_hash(orows, ocols)
        status = "OK " if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name:24s} {status} rows={len(rows):7d}/{len(orows):7d} "
            f"schema={'Y' if ok_schema else 'N'} hash={'Y' if ok_hash else 'N'} "
            f"({time.time() - t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append((name, f"count={ok_count} schema={ok_schema} hash={ok_hash}"))
            if ok_schema and not ok_hash:
                s = {tuple(_norm(v) for v in r) for r in rows}
                d = {tuple(_norm(v) for v in r) for r in orows}
                print("   only-spark:", list(s - d)[:3])
                print("   only-duck :", list(d - s)[:3])
    spark.stop()
    if failures:
        print("\nFAILURES:", failures)
        sys.exit(1)
    print("\nALL MATCH")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2:] or None)
