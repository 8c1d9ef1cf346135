"""Similarity search over embedding columns (engine addition).

* ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  codegen-safe higher-order-function dot product (see ``dot_col``),
  norms precomputed per SIDE before the join, per-query top-k window.
* ``lsh_bucket_topk`` — scale path: random-hyperplane (SimHash) bucket
  join first, exact re-rank inside buckets.  At 100 TB the corpus side
  is written bucketed by signature, so a query touches only its bucket
  (+ optional multi-probe neighbours) instead of the full corpus.

Round-4 codegen fix: the previous per-PAIR expression (three unrolled
64-term dots, duplicated again into the filter) blew janino's 64 KB
method limit, so Spark silently fell back to INTERPRETED evaluation of
exactly the hot path every IVF/kNN probe re-ranks on.  The fixed shape:

* norms are computed once per SIDE before the join (n rows, not n²);
* the n² pair stream evaluates ONE dot — unrolled text for dims up to
  ``UNROLL_MAX_DIM``, ``dot_col`` (one compact higher-order-function
  expression, ``F.aggregate(F.zip_with(...))``) above.

Round-5 boundary (settles VERDICT r4's "contradictory measurements"
finding — the r4 comment here claiming "13.8 → 7-8 s" for the dim-64
unrolled form was WRONG; BASELINE's 35-37 s matrix row was right):
one interleaved same-session A/B (``tools/ab_dot_pair.py``, sf0.1
all-pairs near-dup shape, median of 3):

  dim 64: unrolled 40.5 s · HOF 23.4 s · unrolled+wholeStage-off 12.7 s
  dim 32: unrolled 0.61 s · HOF 1.15 s   (sub-second, ~noise)
  dim 16: unrolled 0.80 s · HOF 1.06 s   (sub-second, ~noise)

At dim 64 the unrolled whole-stage method lands in HotSpot's
8-64 KB compile-but-never-JIT window (the r4 BASELINE "Codegen vs the
JIT" mechanism) and runs ~2× slower than HOF; at ≤32 dims it stays
JIT-able and is marginally ahead.  Hence ``UNROLL_MAX_DIM = 32``.

Both forms fold left-to-right with per-element double casts — the same
float64 tree as the unrolled ``sqlgen.dot_sql`` text the DuckDB
oracles run, so gate parity is unchanged (pinned bit-exact in
tests/test_plans_r4.py, which also compiles every WholeStageCodegen
subtree via the debug API and bans the -1 compile-failure marker).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType
from pyspark.sql.window import Window

from .. import sqlgen

# boundary is the HotSpot JIT window, not janino's 64 KB compile limit:
# at dim 64 the unrolled pair stage compiles but never JITs (8-64 KB
# window) and loses 2× to the HOF form; at ≤32 it JITs and wins
# marginally — measured, see module docstring + tools/ab_dot_pair.py
UNROLL_MAX_DIM = 32


def dot_col(a: Column, b: Column) -> Column:
    """Codegen-safe dot product of two equal-length float arrays: one
    higher-order-function expression — compact bytecode at ANY dim.
    Left-to-right fold from 0.0 with per-element double casts — the
    same float64 tree as ``sqlgen.dot_sql`` (0.0 + t0 ≡ t0 in IEEE for
    the non-zero embeddings this runs on), so results stay bit-exact
    vs the oracle text."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(v: Column) -> Column:
    return F.sqrt(dot_col(v, v))


def dot_pair(a: str, b: str, dim: int) -> Column:
    """The n²-pair-stream dot: unrolled (codegen) while a single dot
    fits the janino method limit, HOF above."""
    if dim <= UNROLL_MAX_DIM:
        return F.expr(sqlgen.dot_sql(a, b, dim, one_based=False))
    return dot_col(F.col(a), F.col(b))


def _cos_pair(vec_q: str, vec_c: str, dim: int) -> Column:
    """Per-pair cosine with the norms read from the precomputed side
    columns (``_qn`` / ``_cn``) — the n² pair stream does ONE dot, not
    three."""
    return dot_pair(vec_q, vec_c, dim) / (F.col("_qn") * F.col("_cn"))


def _with_norms(queries: DataFrame, corpus: DataFrame,
                vec_q: str, vec_c: str) -> tuple[DataFrame, DataFrame]:
    return (
        queries.withColumn("_qn", norm_col(F.col(vec_q))),
        corpus.withColumn("_cn", norm_col(F.col(vec_c))),
    )


def cosine_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 3,
                id_q: str = "qid", id_c: str = "cid",
                vec_q: str = "q_vec", vec_c: str = "c_vec") -> DataFrame:
    """→ (qid, rank, cid, cos_sim) — exact cosine top-k, self-matches
    excluded, ties broken by cid for determinism."""
    qn, cn = _with_norms(queries, corpus, vec_q, vec_c)
    joined = F.broadcast(qn).crossJoin(cn).filter(F.col(id_q) != F.col(id_c))
    w = Window.partitionBy(id_q).orderBy(F.col("cos_sim").desc(), F.col(id_c).asc())
    return (
        joined.withColumn("cos_sim", F.round(_cos_pair(vec_q, vec_c, dim), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_q, "rank", id_c, "cos_sim")
    )


def simhash_signature(df: DataFrame, vec_col: str, dim: int, n_bits: int = 16,
                      seed: int = 7) -> DataFrame:
    """Append an LSH bucket id: sign pattern of ``n_bits`` fixed random
    hyperplanes (deterministic seed).  Built-in-only: each bit is an
    unrolled dot-product sign, packed with bit arithmetic."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    bucket = None
    for b in range(n_bits):
        # one HOF dot per plane (codegen-safe; the unrolled form was
        # n_bits × dim terms — the same janino 64 KB class as dot_col)
        plane = F.array(*[F.lit(float(planes[b, i])) for i in range(dim)])
        s = dot_col(F.col(vec_col), plane)
        bit = F.when(s >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return df.withColumn("bucket", bucket.cast("long"))


def _kmeans_centroids(sample: np.ndarray, n_clusters: int, iters: int = 8,
                      seed: int = 11) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample (numpy
    only — no sklearn in this container)."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), n_clusters, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(0)
    return centroids


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray,
               out_col: str = "ivf_cell") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell) — Arrow-
    batched numpy matmul over broadcast centroids."""
    c = centroids.astype(np.float64)
    c_norm2 = (c ** 2).sum(1)

    @F.pandas_udf(IntegerType())
    def cell(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy())
        d = -2.0 * (x @ c.T) + c_norm2[None, :]  # argmin over ||x-c||²
        return pd.Series(d.argmin(1).astype(np.int32))

    return df.withColumn(out_col, cell(F.col(vec_col)))


def train_ivf_centroids(corpus: DataFrame, n_clusters: int = 16,
                        sample_rows: int = 2000, id_c: str = "cid",
                        vec_c: str = "c_vec") -> np.ndarray:
    """Deterministic IVF centroid model from an id-ORDERED sample (a bare
    LIMIT's row order is partition-order-dependent and would make the
    model — and thus the probe sets — run-dependent).  A tiny driver-side
    artifact, broadcast into the assign/probe UDF closures."""
    sample = np.stack([
        np.asarray(r[vec_c], dtype=np.float64)
        for r in corpus.select(id_c, vec_c).orderBy(id_c).limit(sample_rows).collect()
    ])
    return _kmeans_centroids(sample, n_clusters)


def _probe_cells_udf(centroids: np.ndarray, n_probe: int):
    """pandas_udf: each vector → its ``n_probe`` nearest centroid ids."""
    c = centroids.astype(np.float64)
    c_norm2 = (c ** 2).sum(1)

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy())
        d = -2.0 * (x @ c.T) + c_norm2[None, :]
        order = d.argsort(1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    return probe_cells


def _probe_rerank(qb: DataFrame, cb: DataFrame, dim: int, k: int,
                  id_q: str, id_c: str, vec_q: str, vec_c: str) -> DataFrame:
    """Probe-cell equi-join + exact cosine re-rank; multi-probe
    duplicates dropped before ranking.  Norms computed once per SIDE
    (pre-join) — the probe-join pair stream does one HOF dot."""
    qn, cn = _with_norms(qb, cb, vec_q, vec_c)
    joined = F.broadcast(qn).join(cn, "ivf_cell").filter(F.col(id_q) != F.col(id_c))
    w = Window.partitionBy(id_q).orderBy(F.col("cos_sim").desc(), F.col(id_c).asc())
    return (
        joined.withColumn("cos_sim", F.round(_cos_pair(vec_q, vec_c, dim), 6))
        .dropDuplicates([id_q, id_c])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_q, "rank", id_c, "cos_sim")
    )


def ivf_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 3,
             n_clusters: int = 16, n_probe: int = 4, sample_rows: int = 2000,
             id_q: str = "qid", id_c: str = "cid",
             vec_q: str = "q_vec", vec_c: str = "c_vec") -> DataFrame:
    """IVF approximate top-k: corpus partitioned into k-means cells; each
    query probes its ``n_probe`` nearest cells and re-ranks exactly inside
    them.  At 100 TB the corpus is written bucketed by ivf_cell
    (``write_ivf_corpus`` + ``ivf_topk_bucketed`` — planning-time
    directory pruning); the centroid model is a tiny driver-side
    artifact (trained once on a sample, broadcast)."""
    centroids = train_ivf_centroids(corpus, n_clusters, sample_rows, id_c, vec_c)
    cb = ivf_assign(corpus, vec_c, centroids)
    qb = queries.withColumn(
        "ivf_cell", F.explode(_probe_cells_udf(centroids, n_probe)(F.col(vec_q)))
    )
    return _probe_rerank(qb, cb, dim, k, id_q, id_c, vec_q, vec_c)


def write_ivf_corpus(corpus: DataFrame, centroids: np.ndarray, out_path: str,
                     vec_c: str = "c_vec") -> None:
    """Materialize the corpus partitioned by IVF cell — the 100 TB ANN
    layout (write_tiles' analog for vector search): a probe query reads
    only its n_probe cell directories; every other cell is pruned at
    planning time.  Iceberg hidden partitioning replaces the explicit
    partitionBy on a real cluster."""
    (
        ivf_assign(corpus, vec_c, centroids)
        .repartition("ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(out_path)
    )


def ivf_topk_bucketed(queries: DataFrame, corpus_path: str,
                      centroids: np.ndarray, dim: int, k: int = 3,
                      n_probe: int = 4, id_q: str = "qid", id_c: str = "cid",
                      vec_q: str = "q_vec", vec_c: str = "c_vec") -> DataFrame:
    """ANN over the cell-partitioned layout: the query side's probe-cell
    set (small by definition) collects into a literal IN filter on the
    PARTITION column, pruning every other cell directory at planning
    time (asserted in tests/test_sink_pruning.py), then the same probe
    join + exact re-rank as ``ivf_topk`` runs over the survivors."""
    spark = queries.sparkSession
    qb = queries.withColumn(
        "ivf_cell", F.explode(_probe_cells_udf(centroids, n_probe)(F.col(vec_q)))
    )
    cells = sorted({r.ivf_cell for r in qb.select("ivf_cell").distinct().collect()})
    cb = spark.read.parquet(corpus_path).filter(F.col("ivf_cell").isin(cells))
    return _probe_rerank(qb, cb, dim, k, id_q, id_c, vec_q, vec_c)


def ivf_recall(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 3,
               n_clusters: int = 16, n_probe: int = 4,
               sample_rows: int = 2000,
               id_q: str = "qid", id_c: str = "cid",
               vec_q: str = "q_vec", vec_c: str = "c_vec") -> float:
    """Measured recall@k of the PRUNED IVF probe against the exact
    brute-force top-k on the same (query, corpus) pair — the in-flight
    telemetry companion to ``ivf_topk`` (VERDICT r3 #9: pruning quality
    should be a reported number, not an assumption).  Run it on a small
    query sample; the corpus side is the same relation the real probe
    reads."""
    exact = cosine_topk(queries, corpus, dim, k, id_q, id_c, vec_q, vec_c) \
        .select(id_q, id_c)
    pruned = ivf_topk(queries, corpus, dim, k, n_clusters, n_probe,
                      sample_rows, id_q, id_c, vec_q, vec_c).select(id_q, id_c)
    n_exact = exact.count()
    if n_exact == 0:
        return 1.0
    n_hit = exact.join(pruned, [id_q, id_c], "left_semi").count()
    return round(n_hit / n_exact, 4)


def lsh_bucket_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 3,
                    n_bits: int = 12, id_q: str = "qid", id_c: str = "cid",
                    vec_q: str = "q_vec", vec_c: str = "c_vec") -> DataFrame:
    """Approximate top-k: SimHash bucket equi-join + exact re-rank.
    Recall < 1 by design; widen with fewer bits or multi-probe."""
    qb, cb = _with_norms(
        simhash_signature(queries, vec_q, dim, n_bits),
        simhash_signature(corpus, vec_c, dim, n_bits),
        vec_q, vec_c,
    )
    joined = qb.join(cb, "bucket").filter(F.col(id_q) != F.col(id_c))
    w = Window.partitionBy(id_q).orderBy(F.col("cos_sim").desc(), F.col(id_c).asc())
    return (
        joined.withColumn("cos_sim", F.round(_cos_pair(vec_q, vec_c, dim), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_q, "rank", id_c, "cos_sim")
    )
