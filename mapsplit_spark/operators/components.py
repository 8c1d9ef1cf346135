"""Connected components over near-dup pair edges → canonical dup groups.

The dedup operators (``minhash_near_dups``, ``hamming_near_dups``,
``emb_near_dup``) emit verified PAIRS; an actual training-data pipeline
must resolve those into GROUPS and keep one representative per group.
Transitivity matters: with the hot-bucket star cap the pair relation is
deliberately sparse (hub edges), so "keep the min of each pair" is
wrong — only the connected component gives the dedup semantics.

Algorithm: distributed min-label propagation with POINTER JUMPING —
each round first takes the min label over graph neighbours, then
contracts label chains by looking up the label of the label
(path doubling), so convergence needs O(log diameter) rounds rather
than O(diameter).  Dedup graphs are star/clique shaped (diameter ≤ ~4,
and the LSH/pHash bucket cap makes >cap clusters explicit hub stars),
so this settles in 2-3 rounds; the loud iteration cap mirrors
``relation_tiles_fixed_point`` — on non-convergence the job RAISES
rather than silently emitting split components.

Scale shape: per round, one shuffle join edges⋈labels + one aggregate
+ one labels⋈labels self-join — all equi-joins on the id key, no
driver-side state; lineage truncated per round via localCheckpoint
(same pattern as the semi-naive relation fixed point).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# driver fast path cap: pair relations at or below this many edges are
# collected and resolved with a single union-find instead of the
# distributed fixpoint (each distributed round costs 3 checkpoint jobs
# + an isEmpty probe — seconds of pure scheduling latency on small
# graphs).  2M edges ≈ 32 MB via Arrow — the same bounded-collect class
# as the IVF probe-cell ids; larger graphs take the distributed path
# unchanged, so the operator stays 100 TB-safe.
CC_DRIVER_MAX_EDGES = int(os.environ.get("SPARK_GRAFT_CC_DRIVER_MAX", "2000000"))


def _driver_components(spark, pdf, id_fields) -> DataFrame:
    """Union-find over a collected pair table; component = min reachable
    vertex id (identical semantics to the distributed min-label
    fixpoint, differentially tested in tests/test_components.py)."""
    import pandas as pd

    codes_a, uniq = pd.factorize(pd.concat([pdf["id_a"], pdf["id_b"]]))
    n_pairs = len(pdf)
    parent = list(range(len(uniq)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(codes_a[:n_pairs], codes_a[n_pairs:]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = [find(i) for i in range(len(uniq))]
    comp_min: dict[int, object] = {}
    for i, r in enumerate(roots):
        v = uniq[i]
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    rows = [(uniq[i].item() if hasattr(uniq[i], "item") else uniq[i],
             comp_min[roots[i]].item() if hasattr(comp_min[roots[i]], "item")
             else comp_min[roots[i]]) for i in range(len(uniq))]
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("v", id_fields, False),
        T.StructField("component", id_fields, False),
    ])
    return spark.createDataFrame(rows, schema)


def connected_components(pairs: DataFrame, max_iters: int = 20,
                         driver_max_edges: int | None = None) -> DataFrame:
    """→ (v, component) for every vertex appearing in ``pairs``
    (columns id_a/id_b), component = MIN vertex id reachable.

    Size-adaptive (r6): the pair relation is materialized once; at or
    below ``driver_max_edges`` (default ``CC_DRIVER_MAX_EDGES``) the
    graph resolves in one driver union-find — dedup-pair graphs after
    banding are tiny relative to the corpus, and the distributed
    fixpoint's per-round job latency dominated three gates.  Above the
    cap the distributed min-label/pointer-jumping fixpoint runs
    unchanged.

    Raises RuntimeError if not converged within ``max_iters`` rounds
    (pointer jumping makes that ~2^max_iters of effective diameter —
    unreachable for any real dedup graph; a silent cap could split
    groups, so like the relation fixed point the failure is loud)."""
    cap = CC_DRIVER_MAX_EDGES if driver_max_edges is None else driver_max_edges
    if cap > 0:
        pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
        # count is cheap on the materialized blocks; limit(cap+1) would
        # also work but count doubles as telemetry
        if pairs.count() <= cap:
            id_type = pairs.schema["id_a"].dataType
            return _driver_components(
                pairs.sparkSession, pairs.toPandas(), id_type)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.groupBy("src").agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("v"),
            F.least("src", "nmin").alias("lab"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # min over neighbours' current labels
        nb = (
            edges.join(labels, edges["dst"] == labels["v"])
            .groupBy("src").agg(F.min("lab").alias("nlab"))
        )
        stepped = (
            labels.join(nb, labels["v"] == nb["src"], "left")
            .select(labels["v"], F.least("lab", "nlab").alias("lab"))
            # materialize before the x/y self-join below: an uncheckpointed
            # plan aliased as both sides would recompute the edges⋈labels
            # join + aggregate twice per round (2× every iteration)
            .localCheckpoint(eager=True)
        )
        # pointer jumping: follow the label's own label (path doubling)
        x, y = stepped.alias("x"), stepped.alias("y")
        jumped = (
            x.join(y, F.col("x.lab") == F.col("y.v"), "left")
            .select(
                F.col("x.v").alias("v"),
                F.least(F.col("x.lab"), F.col("y.lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.join(labels.withColumnRenamed("lab", "old"), "v")
            .filter(F.col("lab") != F.col("old"))
        )
        done = changed.isEmpty()
        labels = jumped
        if done:
            return labels.select("v", F.col("lab").alias("component"))
    raise RuntimeError(
        f"connected_components: not converged after {max_iters} rounds — "
        "pathological chain graph; raise max_iters"
    )


def dedup_keep(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
               max_iters: int = 20) -> DataFrame:
    """Drop every document that is NOT its dup group's representative
    (component min); documents in no pair survive untouched.  The
    standard corpus-dedup reduction: |kept| = |docs| − Σ (|group|−1)."""
    comp = connected_components(pairs, max_iters)
    losers = comp.filter(F.col("v") != F.col("component")).select(
        F.col("v").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
