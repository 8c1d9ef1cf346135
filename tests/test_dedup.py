"""Dedup suite tests — MinHash-LSH recall/precision on planted near-dups,
exact dedup, SimHash locality, and an independent pure-Python Jaccard
check of every surfaced pair."""

from __future__ import annotations

import pytest

from mapsplit_spark.operators.dedup import (
    exact_dup_groups,
    minhash_near_dups,
    simhash_text,
    with_shingle_hashes,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "parrots watch from a tall oak tree near the river bank in summer"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d0", BASE),
        ("d1", BASE),  # exact dup of d0
        ("d2", BASE.replace("summer", "winter")),        # near dup (1 token)
        ("d3", BASE.replace("quick brown", "slow red")), # near dup (2 tokens)
        ("d4", "completely different text about spark dataframes and shuffles "
               "with partitions executors and adaptive query execution plans"),
        ("d5", "yet another unrelated document mentioning tile pyramids mercator "
               "projections zoom levels and slippy map coordinate conventions"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + n]) for i in range(max(1, len(w) - n + 1))}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dup(docs):
    got = exact_dup_groups(docs).collect()
    assert len(got) == 1
    assert got[0].n_docs == 2 and got[0].keep_doc == "d0"


def test_minhash_lsh_finds_planted_dups(docs):
    rows = {(r.id_a, r.id_b): r.jaccard for r in minhash_near_dups(docs, threshold=0.5).collect()}
    assert ("d0", "d1") in rows and rows[("d0", "d1")] == 1.0
    assert ("d0", "d2") in rows or ("d1", "d2") in rows  # 1-token edit
    # unrelated docs never pass exact verification
    assert not any("d4" in p or "d5" in p for p in rows)
    # every reported jaccard matches an independent python recomputation
    texts = {r.doc_id: r.text for r in docs.collect()}
    for (a, b), j in rows.items():
        assert abs(_py_jaccard(texts[a], texts[b]) - j) < 1e-6


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("s", "two words")], "doc_id string, text string")
    r = with_shingle_hashes(df).collect()[0]
    assert len(r.shingles) == 1  # < n tokens → whole doc as one shingle


def test_simhash_locality(docs):
    sh = {r.doc_id: r.simhash for r in simhash_text(docs).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFF).count("1")

    assert sh["d0"] == sh["d1"]
    assert ham(sh["d0"], sh["d2"]) < ham(sh["d0"], sh["d4"])


def test_hot_bucket_cap_bounds_candidates(spark):
    """A pathological bucket (many identical docs → one band hash) must
    not produce |B|² candidate rows: above the cap the bucket degrades
    to STAR edges (hub = min id), keeping O(B) candidates while the
    cluster stays CONNECTED through the hub; normal-size buckets keep
    all-pairs."""
    from mapsplit_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    junk = [(f"j{i:02d}", "lorem ipsum dolor sit amet " * 3) for i in range(60)]
    real = [("a0", BASE), ("a1", BASE.replace("summer", "winter"))]
    df = spark.createDataFrame(junk + real, "doc_id string, text string")
    sigs = minhash_signatures(with_shingle_hashes(df), 32)
    uncapped = lsh_candidate_pairs(sigs, bands=8, max_bucket=None)
    assert uncapped.filter("id_a LIKE 'j%' AND id_b LIKE 'j%'").count() == 60 * 59 // 2
    capped = lsh_candidate_pairs(sigs, bands=8, max_bucket=16)
    star = capped.filter("id_a LIKE 'j%' AND id_b LIKE 'j%'").collect()
    assert len(star) == 59  # O(B), not B²
    assert all(r.id_a == "j00" for r in star)  # hub-connected cluster
    # the planted near-dup pair still surfaces with the cap active
    assert capped.filter("id_a = 'a0' AND id_b = 'a1'").count() == 1


def test_minhash_recall_with_default_cap(docs):
    """The default cap must not change recall on normal corpora — same
    planted-dup assertions as the uncapped pipeline."""
    rows = {(r.id_a, r.id_b) for r in
            minhash_near_dups(docs, threshold=0.5, max_bucket=64).collect()}
    assert ("d0", "d1") in rows
    assert ("d0", "d2") in rows or ("d1", "d2") in rows


def test_hot_bucket_observation_reports_cap_hits(spark):
    """The Observation hook surfaces hot-bucket degradation in-flight
    (piggybacked on the existing bucket-stats aggregate — no extra job):
    n_hot_buckets > 0 exactly when the star fallback engaged."""
    from pyspark.sql import Observation

    from mapsplit_spark.operators.dedup import minhash_near_dups

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta copy {i % 2}")
         for i in range(40)],
        "doc_id long, text string",
    )
    obs = Observation("lsh_hot")
    out = minhash_near_dups(docs, threshold=0.5, max_bucket=4, observation=obs)
    assert out.count() > 0  # action → metrics available
    m = obs.get
    assert m["n_hot_buckets"] > 0
    assert m["max_bucket_size"] >= 20  # two 20-doc near-identical groups
    assert m["n_star_docs"] > 0

    obs2 = Observation("lsh_cold")
    out2 = minhash_near_dups(docs.limit(4), threshold=0.5, max_bucket=1024,
                             observation=obs2)
    out2.count()
    assert obs2.get["n_hot_buckets"] == 0
