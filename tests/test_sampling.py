"""Deterministic sampling operators (operators/sampling.py): portable
hash cross-engine equality, split stability under repartitioning,
map-only plan pin, stratified cap vs Python recomputation."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from mapsplit_spark.operators.sampling import (
    MOD,
    deterministic_split,
    portable_hash_sql,
    stratified_cap,
)


def _py_bucket(val: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + val).encode()).hexdigest()[:8], 16) % MOD


def _docs(spark, n=400):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_portable_hash_matches_python_and_duckdb(spark):
    sql = portable_hash_sql("doc_id", salt="s1")
    got = {
        r.doc_id: r.b
        for r in _docs(spark, 50).select(
            "doc_id", F.expr(sql).alias("b")).collect()
    }
    want = {i: _py_bucket(str(i), "s1") for i in range(50)}
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT unnest(range(50)) AS doc_id")
    duck = dict(con.sql(f"SELECT doc_id, {sql} FROM d").fetchall())
    assert duck == want


def test_split_stable_and_complete(spark):
    d = _docs(spark, 2000)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split
         for r in deterministic_split(d, "doc_id", w).collect()}
    b = {r.doc_id: r.split
         for r in deterministic_split(
             d.repartition(13), "doc_id", w).collect()}
    assert a == b                       # partitioning-independent
    assert len(a) == 2000               # every row assigned
    n_train = sum(1 for s in a.values() if s == "train")
    assert 0.75 < n_train / 2000 < 0.85  # weights honored (hash-uniform)
    # expected assignment from the Python-side bucket
    for i in (0, 7, 1999):
        bkt = _py_bucket(str(i))
        want = "train" if bkt < 800000 else ("val" if bkt < 900000 else "test")
        assert a[i] == want, i


def test_split_is_map_only(spark):
    plan = (
        deterministic_split(_docs(spark), "doc_id", {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="weights"):
        deterministic_split(_docs(spark), "doc_id", {"a": 0.0})


def test_stratified_cap_matches_python_order(spark):
    d = _docs(spark, 300)
    out = stratified_cap(d, ["lang"], 10, "doc_id", salt="z")
    got = {(r.lang, r.doc_id) for r in out.collect()}
    want = set()
    for lang in ("en", "de", "fr"):
        ids = [i for i in range(300) if ["en", "de", "fr"][i % 3] == lang]
        ids.sort(key=lambda i: (_py_bucket(str(i), "z"), i))
        want |= {(lang, i) for i in ids[:10]}
    assert got == want
    # stable under repartition; different salt → different selection
    again = {(r.lang, r.doc_id)
             for r in stratified_cap(
                 d.repartition(7), ["lang"], 10, "doc_id", salt="z").collect()}
    assert again == got
    other = {(r.lang, r.doc_id)
             for r in stratified_cap(d, ["lang"], 10, "doc_id",
                                     salt="y").collect()}
    assert other != got
