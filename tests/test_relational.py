"""Bespoke relational/stateful-batch invariants (bounds, smoke, sketch
accuracy).

The per-query oracle sweep that used to live here (``test_oracle_match``
parametrized over ``registry.all_oracles()``) was an exact duplicate of
``test_full_registry_oracle.py::test_query_matches_oracle`` — same sf dir,
same DuckDB comparison, same strictness, run over a SUBSET of the names
the registry sweep covers (all_oracles ⊆ all_queries, and the registry
sweep additionally fails any query *missing* an oracle). Round 10 removed
the duplicate: every query still gets exactly the same oracle check, once
(driver verify was timing out — VERDICT r9 #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry

operators.load_all()


def test_approx_distinct_within_bounds(spark, sf_dir):
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in registry.get("q10_count_distinct").fn(spark, sf_dir).collect()
    }
    rows = registry.get("q10b_approx_distinct").fn(spark, sf_dir).collect()
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_parts"] == exact[r["l_returnflag"]]
        assert r["approx_within_3rsd"] is True, r


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"userId", "visits", "totalVisits"}
    total = sum(r["totalVisits"] for r in rows)
    assert total == sum(len(r["visits"]) for r in rows)


def test_hll_sketch_estimates_within_bounds(spark, sf_dir):
    """DataSketches HLL estimates within 5% of exact per-type cardinality,
    and the unioned global sketch within 5% of the global exact count."""
    from spark_state_provider_spark.tables import load_table

    rows = registry.get("q10d_hll_sketch").fn(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in rows}
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = e.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, v in exact.items():
        assert got[k]["exact_users"] == v, (k, got[k], v)
        assert got[k]["approx_within_5pct"] is True, got[k]


def test_approx_percentile_brackets_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in registry.get("q10c_percentiles").fn(spark, sf_dir).collect()
    }
    rows = registry.get("q10e_approx_percentile").fn(spark, sf_dir).collect()
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        p50, p95 = exact[r["l_returnflag"]]
        # the exact ±0.01-quantile brackets must straddle the exact value...
        assert r["p50_lo"] <= p50 <= r["p50_hi"], r
        assert r["p95_lo"] <= p95 <= r["p95_hi"], r
        # ...and the GK sketch estimate must land inside them
        assert r["p50_in_bounds"] is True, r
        assert r["p95_in_bounds"] is True, r
