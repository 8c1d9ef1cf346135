"""Temporal operators (operators/temporal.py): as-of join, gap
sessionization, binned range join — value checks against naive Python
recomputation and plan-shape pins (no BNLJ / no join node where the
design promises none)."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from mapsplit_spark.operators.temporal import (
    asof_join,
    range_join_binned,
    sessionize_gaps,
)

EPOCH = dt.datetime(2024, 1, 1)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_events(seed: int, n: int, keys: int):
    rng = random.Random(seed)
    return [
        (i, rng.randrange(keys), EPOCH + dt.timedelta(seconds=rng.randrange(0, 50_000)),
         round(rng.random(), 3))
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, k long, ts timestamp_ntz, v double"
    )


# --------------------------------------------------------------- asof


def test_asof_join_matches_naive(spark):
    lrows = _mk_events(1, 150, 5)
    rrows = _mk_events(2, 120, 5)
    # dedupe right per (k, ts): keep max id (operator contract)
    best = {}
    for i, k, ts, v in rrows:
        cur = best.get((k, ts))
        if cur is None or i > cur[0]:
            best[(k, ts)] = (i, v)
    rdedup = [(i, k, ts, v) for (k, ts), (i, v) in best.items()]

    left = _df(spark, lrows)
    right = _df(spark, rdedup).select(
        "k", "ts", F.col("id").alias("rid"), F.col("v").alias("rv")
    )
    out = asof_join(left, right, on="k", matched_ts_col="mts")
    got = {r.id: (r.rid, r.mts) for r in out.collect()}

    assert len(got) == len(lrows)
    for i, k, ts, _v in lrows:
        cand = [(rts, rid) for rid, rk, rts, _ in rdedup
                if rk == k and rts <= ts]
        want = max(cand) if cand else None
        assert got[i] == ((want[1], want[0]) if want else (None, None)), i


def test_asof_join_tolerance_and_ties(spark):
    t0 = EPOCH
    left = _df(spark, [(1, 0, t0, 0.0),
                       (2, 0, t0 + dt.timedelta(seconds=100), 0.0)])
    right = _df(spark, [(10, 0, t0, 1.0)]).select(
        "k", "ts", F.col("id").alias("rid"))
    # equal timestamps match (>=, ASOF semantics)
    out = {r.id: r.rid for r in asof_join(left, right, on="k").collect()}
    assert out == {1: 10, 2: 10}
    # tolerance nulls out matches older than left_ts - tol
    out = {r.id: r.rid
           for r in asof_join(left, right, on="k", tolerance_s=50).collect()}
    assert out == {1: 10, 2: None}


def test_asof_join_numeric_ts_and_clash_guard(spark):
    left = spark.createDataFrame([(1, 0, 10.0)], "id long, k long, ts double")
    right = spark.createDataFrame([(7, 0, 9.5)], "rid long, k long, ts double")
    out = asof_join(left, right, on="k", tolerance_s=1.0).collect()
    assert out[0].rid == 7
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right.withColumnRenamed("rid", "id"), on="k")


def test_asof_join_plan_has_no_join_node(spark):
    left = _df(spark, _mk_events(3, 50, 3))
    right = _df(spark, _mk_events(4, 50, 3)).select(
        "k", "ts", F.col("id").alias("rid"))
    plan = _plan(asof_join(left, right, on="k"))
    assert "Join" not in plan  # union + window only
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------------------- sessionize


def test_sessionize_gaps_basic(spark):
    t = lambda s: EPOCH + dt.timedelta(seconds=s)
    rows = [(1, 0, t(0), 0.0), (2, 0, t(100), 0.0), (3, 0, t(2000), 0.0),
            (4, 0, t(2100), 0.0), (5, 1, t(0), 0.0)]
    out = sessionize_gaps(_df(spark, rows), "k", "ts", gap_s=900,
                          order_cols=["id"])
    got = {r.id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_gaps_boundary_is_strict(spark):
    # a gap of EXACTLY gap_s stays in the same session (> comparison)
    t = lambda s: EPOCH + dt.timedelta(seconds=s)
    rows = [(1, 0, t(0), 0.0), (2, 0, t(900), 0.0),
            (3, 0, t(1801), 0.0)]
    out = sessionize_gaps(_df(spark, rows), "k", "ts", gap_s=900)
    got = {r.id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


# -------------------------------------------------------- range join


def test_range_join_binned_matches_naive(spark):
    lrows = _mk_events(5, 120, 4)
    rrows = _mk_events(6, 140, 4)
    left = _df(spark, lrows).select(
        F.col("id").alias("lid"), "k", "ts")
    right = _df(spark, rrows).select(
        "k", F.col("ts").alias("rts"), F.col("id").alias("rid"))
    for strict in (False, True):
        out = range_join_binned(
            left, right, on="k", left_ts="ts", right_ts="rts",
            lower_s=-3600, upper_s=0, strict_lower=strict,
        )
        got = {(r.lid, r.rid) for r in out.collect()}
        want = set()
        for li, lk, lts, _ in lrows:
            for ri, rk, rts, _ in rrows:
                lo_ok = rts > lts - dt.timedelta(seconds=3600) if strict \
                    else rts >= lts - dt.timedelta(seconds=3600)
                if lk == rk and lo_ok and rts <= lts:
                    want.add((li, ri))
        assert got == want, f"strict={strict}"


def test_range_join_binned_is_equi_join(spark):
    left = _df(spark, _mk_events(7, 30, 3)).select(
        F.col("id").alias("lid"), "k", "ts")
    right = _df(spark, _mk_events(8, 30, 3)).select(
        "k", F.col("ts").alias("rts"), F.col("id").alias("rid"))
    plan = _plan(range_join_binned(
        left, right, on="k", left_ts="ts", right_ts="rts",
        lower_s=-600, upper_s=0))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_binned_guards(spark):
    df = _df(spark, _mk_events(9, 5, 2))
    with pytest.raises(ValueError, match="ambiguous"):
        range_join_binned(df, df, on="k", lower_s=-1, upper_s=0)
    with pytest.raises(ValueError, match="upper_s"):
        range_join_binned(
            df.select("k", "ts"),
            df.select("k", F.col("ts").alias("t2")),
            on="k", right_ts="t2", lower_s=0, upper_s=-1)


# ------------------------------------------- portable SimHash formulas


def test_simhash_formulas_cross_engine(spark):
    """The sqlgen md5-nibble SimHash expressions evaluate identically
    in Spark SQL and DuckDB (the doc_simhash gate's construction)."""
    from mapsplit_spark import sqlgen

    votes = [sqlgen.simhash_vote_agg_sql("tok", b) for b in range(16)]
    combine = sqlgen.simhash_combine_sql([f"v{b}" for b in range(16)])
    toks = ["alpha", "beta", "gamma", "delta", "epsilon", ""]

    sdf = spark.createDataFrame([(t,) for t in toks], "tok string")
    agg = sdf.groupBy().agg(
        *[F.expr(v).alias(f"v{b}") for b, v in enumerate(votes)])
    s_val = agg.select(F.expr(combine).alias("s")).collect()[0].s

    con = duckdb.connect()
    con.execute("CREATE TABLE t(tok VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in toks])
    v_sql = ", ".join(f"{v} AS v{b}" for b, v in enumerate(votes))
    d_val = con.sql(
        f"SELECT {combine} AS s FROM (SELECT {v_sql} FROM t)"
    ).fetchone()[0]

    assert s_val == d_val
    assert 0 <= s_val < 2 ** 16
