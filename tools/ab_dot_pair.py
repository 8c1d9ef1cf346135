"""Interleaved same-session A/B for the pair-stream dot form (VERDICT
r4 "What's wrong #2"): the round-4 record contains contradictory
numbers for the unrolled dot on the sf0.1 all-pairs near-dup shape
(7-8 s in similarity.py's comment vs 35-37 s in BASELINE's matrix).
This probe settles it: ONE session, the exact ``emb_near_dup`` shape
(2 000 × 64-dim, ~2 M pairs, side norms + one dot per pair), three
forms interleaved A,B,C × ``--reps``:

  A  unrolled dot text (sqlgen.dot_sql)        — dot_pair's dim≤128 path
  B  higher-order-function dot (dot_col)       — dot_pair's dim>128 path
  C  unrolled + spark.sql.codegen.wholeStage=false

Run on a QUIET machine.  Prints one JSON line; UNROLL_MAX_DIM is set
from the winner of A vs B.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from mapsplit_spark import sqlgen
from mapsplit_spark.operators.similarity import dot_col, norm_col
from mapsplit_spark.session import get_spark

DIM = 64


def _load(spark, sf_dir: str, dim: int):
    """dim=64: the real sf embeddings table; other dims: deterministic
    synthetic vectors of the same cardinality (2 000 rows at sf0.1)."""
    if dim == DIM:
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    elems = [
        F.expr(f"CAST(((vec_id * {97 * i + 13}) % 1000) AS DOUBLE) / 250.0 - 2.0")
        for i in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*elems).alias("embedding"))


def build(spark, sf_dir: str, form: str, dim: int = DIM):
    emb = _load(spark, sf_dir, dim)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                   norm_col(F.col("embedding")).alias("_na"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                   norm_col(F.col("embedding")).alias("_nb"))
    if form == "hof":
        dot = dot_col(F.col("va"), F.col("vb"))
    else:
        dot = F.expr(sqlgen.dot_sql("va", "vb", dim, one_based=False))
    cos = dot / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= 0.35)
        .select("id_a", "id_b", "cos_sim")
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dim", type=int, default=DIM)
    args = ap.parse_args(argv)

    spark = get_spark("ab-dot-pair")
    spark.sparkContext.setLogLevel("ERROR")
    forms = ["unrolled", "hof", "unrolled_nowsc"]
    times: dict[str, list[float]] = {f: [] for f in forms}
    rows: dict[str, int] = {}
    for _ in range(args.reps):
        for form in forms:
            wsc = form != "unrolled_nowsc"
            spark.conf.set("spark.sql.codegen.wholeStage", str(wsc).lower())
            df = build(spark, args.sf_dir,
                       "hof" if form == "hof" else "unrolled", args.dim)
            t0 = time.monotonic()
            rows[form] = df.count()
            times[form].append(round(time.monotonic() - t0, 2))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert len(set(rows.values())) == 1, rows

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    out = {"metric": "dot_pair_ab", "dim": args.dim, "rows": rows["hof"],
           "sf_dir": args.sf_dir,
           "samples": times,
           "median": {f: med(times[f]) for f in forms}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
