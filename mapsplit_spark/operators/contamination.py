"""Train→test contamination detection via winnow fingerprints.

Training-data engine addition: before training, every evaluation/test
document must be checked for n-gram overlap against the training split
(benchmark leakage).  The textbook approach — compare all test×train
document pairs — is quadratic; this operator reduces it to ONE
equi-join on winnowing fingerprints (Schleimer et al. 2003, the same
construction as ``textstats.winnow_fingerprints``): any shared
substring of length ≥ w + k − 1 characters is guaranteed to contribute
at least one common fingerprint, so a pair with real overlap cannot be
missed, and pairs that share none are never materialized.

Scale shape:
- fingerprint pass: map-only over each split (built-in expressions);
- ubiquitous-fingerprint filter (document frequency > ``max_df``):
  boilerplate grams (headers, licence text) would otherwise create hot
  join keys; dropping them bounds the per-fingerprint fan-out to
  ``max_df`` docs per side — the same hot-key cap philosophy as the
  LSH bucket cap, but exact: a dropped fp can only LOWER n_shared, and
  the report states the threshold;
- one equi-join on fp + one (test, train) count aggregate.  No theta
  join, no all-pairs stage, bounded skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _winnow_fps


def contamination_pairs(
    docs: DataFrame,
    test_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    max_df: int = 20,
    min_shared: int = 2,
    portable: bool = True,
) -> DataFrame:
    """→ (test_id, train_id, n_shared): test documents sharing
    ≥ ``min_shared`` winnow fingerprints (k-char grams, window w) with
    a training document.  ``test_ids`` is a 1-column DataFrame of ids
    in the held-out split; every other doc is the training side.

    ``portable=True`` uses md5-string gram hashes (the oracle-checkable
    variant); ``portable=False`` uses xxhash64 longs (8 B/gram — the
    production choice, same guarantee)."""
    hash_fn = F.md5 if portable else F.xxhash64
    # HARD barrier before the explode: Generate's input collapses with
    # _winnow_fps's projections (each referenced once here), and an
    # expression inlined into a transform() lambda re-evaluates PER
    # ELEMENT — the L²/L³ trap textstats.py's PROJECTION BARRIER note
    # documents (measured: the sf0.001 gate never finished — killed at
    # 9 min — vs 4 s for the winnow pass itself with this checkpoint).
    # It also pins the relation for its four consumers below (df-filter
    # aggregate, its semi-join back, the test/train split sides).
    # eager: the lazy variant re-entered the (now Arrow) winnow kernel on
    # its cold first consumer — measured 6.5 s vs 1.8 s first-run at
    # sf0.1 (r6 A/B); warm runs tie
    fps = _winnow_fps(docs, k, w, id_col, text_col, hash_fn) \
        .localCheckpoint(eager=True)
    ex = fps.select(F.col(id_col), F.explode("fps").alias("fp"))
    # fps are distinct per doc, so this doc-frequency is exact
    keep = (ex.groupBy("fp").agg(F.count("*").alias("fp_df"))
            .filter(F.col("fp_df") <= max_df).select("fp"))
    ex = ex.join(keep, "fp", "left_semi")
    tids = test_ids.select(F.col(test_ids.columns[0]).alias(id_col)).distinct()
    test = ex.join(tids, id_col, "left_semi") \
        .select(F.col(id_col).alias("test_id"), "fp")
    train = ex.join(tids, id_col, "left_anti") \
        .select(F.col(id_col).alias("train_id"), "fp")
    return (
        test.join(train, "fp")
        .groupBy("test_id", "train_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    docs: DataFrame,
    test_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Corpus reduction: drop every TRAINING document flagged against
    any test document (the conservative pre-training scrub).  Test rows
    themselves are kept (they are not training data)."""
    flagged = contamination_pairs(
        docs, test_ids, id_col, text_col, **kwargs
    ).select(F.col("train_id").alias(id_col)).distinct()
    return docs.join(flagged, id_col, "left_anti")
