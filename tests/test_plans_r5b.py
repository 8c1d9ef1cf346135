"""Plan pins for the r5 sketch/sampling/index additions — the physical
shapes the 100 TB story depends on, so regressions surface as test
failures, not bench drift:

* weighted_sample: partial WindowGroupLimit BEFORE the exchange (only
  top-n rows per input partition per stratum reach the shuffle);
* HLL: map-side partial max on (group, register) before the single
  register exchange — shuffle ≤ groups × 2^p rows at any cardinality;
* quantile gate: partial percentile aggregation (map-side combine);
* clip_strtree gate: column pruning reaches the scan (only event_id is
  read — lon/lat are derived expressions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_pushes_partial_topk(spark):
    from mapsplit_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(weighted_sample(docs, "doc_id", "n_chars", 5, ["lang"], "s"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # a Partial WindowGroupLimit must sit below the exchange
    partial = plan.find("WindowGroupLimit")
    partial = plan.find("Partial", partial)
    exch = plan.find("Exchange hashpartitioning")
    assert partial != -1 and exch != -1
    assert exch < partial, "partial TopK must be BELOW (after in text) the exchange"


def test_hll_partial_max_before_single_register_exchange(spark):
    from mapsplit_spark.operators.sketches import hll_registers

    ev = spark.read.parquet(f"{SF}/events.parquet")
    for portable, p in ((False, 12), (True, 8)):
        plan = _plan(hll_registers(ev, ["event_type"], "user_id",
                                   p=p, portable=portable))
        assert "partial_max(rho" in plan, plan[:500]
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_estimate_two_exchanges_total(spark):
    from mapsplit_spark.operators.sketches import hll_distinct

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(hll_distinct(ev, ["event_type"], "user_id", p=12))
    # register agg + estimate fold — nothing else shuffles
    assert plan.count("Exchange hashpartitioning") == 2


def test_quantile_gate_partial_aggregation(spark):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["event_quantiles"](spark, SF))
    assert "partial_percentile" in plan
    assert "BatchEvalPython" not in plan


def test_clip_strtree_gate_prunes_scan_to_id(spark):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["clip_strtree"](spark, SF))
    # derived lon/lat come from event_id arithmetic — the parquet scan
    # must read ONLY event_id
    assert "ReadSchema: struct<event_id:bigint>" in plan, plan[-800:]


def test_event_geohash_gate_is_map_only(spark):
    """Geohash encode is a pure projection: NO exchange, NO Python —
    at 100 TB it pipelines inside the scan stage."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["event_geohash"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ReadSchema: struct<event_id:bigint>" in plan, plan[-800:]


def test_doc_tfidf_plan_shape(spark):
    """TF-IDF: partial-aggregated shuffles only, corpus count joins as
    a BROADCAST (never a shuffle), no Python anywhere."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["doc_tfidf"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # tf groupBy must partial-aggregate map-side before its exchange
    assert "partial_count" in plan
