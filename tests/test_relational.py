"""Oracle-compare every registered relational + stateful-batch query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry

from tests.oracle import compare_query

operators.load_all()

ORACLE_QUERIES = sorted(registry.all_oracles())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_approx_distinct_within_bounds(spark, sf_dir):
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in registry.get("q10_count_distinct").fn(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in registry.get("q10b_approx_distinct").fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(5, 0.1 * n), (k, approx[k], n)


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
    est = {r["event_type"]: r["approx_users"] for r in rows}
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = e.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert abs(est[k] - v) <= max(2.0, 0.05 * v), (k, est[k], v)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in registry.get("q10c_percentiles").fn(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_p"]
        for r in registry.get("q10e_approx_percentile").fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, (p50, p95) in exact.items():
        a50, a95 = approx[k]
        # GK sketch at accuracy 10000 is near-exact at these row counts;
        # allow 1% relative slack for the interpolation-vs-rank difference
        assert abs(a50 - p50) <= 0.01 * p50, (k, a50, p50)
        assert abs(a95 - p95) <= 0.01 * p95, (k, a95, p95)
