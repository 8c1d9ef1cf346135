"""Round-4 plan pins: the vector re-rank path must whole-stage codegen.

VERDICT r3 #1: the unrolled 64-dim dot-product expression blew janino's
64 KB method limit on the pair stage of ``emb_near_dup`` (and was one
borderline plan-shape away from doing so in every IVF/kNN re-rank), so
Spark silently fell back to INTERPRETED evaluation of exactly the hot
path — correctness unaffected, a constant-factor scale tax at 100 TB.

The fix (operators/similarity.dot_col): one higher-order-function
expression per pair dot, norms precomputed per SIDE before the join.
These tests pin it by compiling the generated code of every
WholeStageCodegen subtree via the debug API and asserting none reports
``maxMethodCodeSize == -1`` (the debug-API marker for a janino compile
failure — observed on the old form's pair stage).  AQE is disabled for
the inspection only: an unexecuted AdaptiveSparkPlan hides its
WholeStageCodegen children from the debug walker.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapsplit_spark import sqlgen
from mapsplit_spark.operators.similarity import (
    cosine_topk,
    dot_col,
    ivf_topk,
    lsh_bucket_topk,
    norm_col,
)

DIM = 16


@pytest.fixture
def no_aqe(spark):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old)


def _codegen_stats(df) -> list[int]:
    """[maxMethodCodeSize per WholeStageCodegen subtree]; -1 = compile
    failure (the silent interpreted fallback this round bans)."""
    seq = df._jdf.queryExecution().debug().codegenToSeq()
    return [seq.apply(i)._3().maxMethodCodeSize() for i in range(seq.size())]


def _assert_all_compile(df, need_subtrees: int = 1) -> None:
    sizes = _codegen_stats(df)
    assert len(sizes) >= need_subtrees, f"no codegen subtrees found: {sizes}"
    assert all(s != -1 for s in sizes), (
        f"a WholeStageCodegen subtree failed to compile (janino 64 KB "
        f"fallback regression): {sizes}"
    )
    assert all(s < 65536 for s in sizes)


def _vectors(spark, n: int, id_name: str, vec_name: str):
    elems = [
        F.expr(f"CAST(((id * {97 * i + 13}) % 1000) AS DOUBLE) / 250.0 - 2.0")
        for i in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias(id_name), F.array(*elems).alias(vec_name)
    )


def test_emb_near_dup_gate_plan_compiles(spark, no_aqe):
    """The exact plan shape that failed in round 3 (dim-64 driver
    fixture, pair filter duplicating the cosine) must now compile in
    every subtree."""
    import __spark_entry__ as entry

    df = entry.q_emb_near_dup(spark, "/root/testdata/sf0.001")
    _assert_all_compile(df, need_subtrees=2)


def test_cosine_topk_plan_compiles(spark, no_aqe):
    q = _vectors(spark, 5, "qid", "q_vec")
    c = _vectors(spark, 200, "cid", "c_vec")
    _assert_all_compile(cosine_topk(q, c, DIM, k=3))


def test_ivf_rerank_plan_compiles(spark, no_aqe):
    q = _vectors(spark, 5, "qid", "q_vec")
    c = _vectors(spark, 300, "cid", "c_vec")
    _assert_all_compile(ivf_topk(q, c, DIM, k=3, n_clusters=4, n_probe=2,
                                 sample_rows=100))


def test_lsh_bucket_topk_plan_compiles(spark, no_aqe):
    """simhash_signature's per-plane dots are HOF now too (the unrolled
    form was n_bits × dim terms — same janino class)."""
    q = _vectors(spark, 5, "qid", "q_vec")
    c = _vectors(spark, 200, "cid", "c_vec")
    _assert_all_compile(lsh_bucket_topk(q, c, DIM, k=3, n_bits=8))


def test_hof_dot_matches_unrolled_bitexact(spark):
    """dot_col / norm_col must produce BIT-IDENTICAL float64 results to
    the unrolled sqlgen.dot_sql text the DuckDB oracles run — the HOF
    fold is left-to-right from 0.0 with per-element double casts, same
    tree."""
    v = _vectors(spark, 500, "vid", "v")
    both = v.select(
        dot_col(F.col("v"), F.col("v")).alias("hof"),
        F.expr(sqlgen.dot_sql("v", "v", DIM, one_based=False)).alias("unrolled"),
        norm_col(F.col("v")).alias("hof_norm"),
        F.expr(f"SQRT({sqlgen.dot_sql('v', 'v', DIM, one_based=False)})").alias("unrolled_norm"),
    )
    bad = both.filter(
        (F.col("hof") != F.col("unrolled"))
        | (F.col("hof_norm") != F.col("unrolled_norm"))
    )
    assert bad.isEmpty()


def test_cosine_topk_same_results_as_r3_form(spark):
    """End-to-end: the per-side-norm HOF formulation returns exactly the
    rows the round-3 unrolled-per-pair formulation returned."""
    from pyspark.sql.window import Window

    q = _vectors(spark, 5, "qid", "q_vec")
    c = _vectors(spark, 200, "cid", "c_vec")
    new = cosine_topk(q, c, DIM, k=3)

    cos = F.expr(
        f"{sqlgen.dot_sql('q_vec', 'c_vec', DIM, one_based=False)} / "
        f"(SQRT({sqlgen.dot_sql('q_vec', 'q_vec', DIM, one_based=False)}) * "
        f"SQRT({sqlgen.dot_sql('c_vec', 'c_vec', DIM, one_based=False)}))"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid").asc())
    old = (
        F.broadcast(q).crossJoin(c).filter(F.col("qid") != F.col("cid"))
        .withColumn("cos_sim", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "rank", "cid", "cos_sim")
    )
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
