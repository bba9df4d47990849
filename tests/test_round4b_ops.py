"""Invariant tests for the round-4 second-batch operators (q150–q158) —
semantic properties the DuckDB oracles can't express (bounds, conservation
laws, cross-query consistency), mirroring the reference's invariant suites.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.tables import load_table

operators.load_all()


def _run(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir)


def test_hamming_topk_bounds_and_shape(spark, sf_dir):
    """Hamming ∈ [0, 64]; exactly top-k per query; self excluded; distance
    non-decreasing along the rank order."""
    from spark_state_provider_spark.operators.similarity import N_QUERIES, TOP_K

    rows = _run(spark, sf_dir, "q150_hamming_topk").collect()
    assert len(rows) == N_QUERIES * TOP_K
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.hamming <= 64
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, TOP_K + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.hamming <= b.hamming


def test_bitmap_distinct_matches_batch_and_bounds(spark, sf_dir):
    """Merged bitmap distinct == plain COUNT(DISTINCT); daily sum bounds it
    from above (re-aggregation can only deduplicate, never invent)."""
    out = {r.event_type: r for r in _run(spark, sf_dir, "q151_bitmap_distinct_rollup").collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for t, r in out.items():
        assert r.distinct_users == exact[t]
        assert r.distinct_users <= r.sum_daily_distinct
        assert r.n_days >= 1


def test_label_propagation_min_invariant(spark, sf_dir):
    """Min-label propagation: a node's community label never exceeds its
    own id, and every label is itself a node id (labels only flow, never
    mutate)."""
    rows = _run(spark, sf_dir, "q152_label_propagation").collect()
    ids = {r.node_id for r in rows}
    assert rows
    for r in rows:
        assert r.community <= r.node_id
        assert r.community in ids


def test_systematic_sample_stripes(spark, sf_dir):
    """At most one selected doc per stripe, stripes strictly increase with
    doc_id, and selected weight is size-biased (mean sampled weight ≥
    corpus mean weight — the PPS property)."""
    from spark_state_provider_spark.operators.pipeline import _SYS_N

    rows = sorted(
        _run(spark, sf_dir, "q153_systematic_weighted_sample").collect(),
        key=lambda r: r.doc_id,
    )
    assert 0 < len(rows) <= _SYS_N
    stripes = [r.stripe for r in rows]
    assert stripes == sorted(stripes)
    assert len(set(stripes)) == len(stripes)
    d = load_table(spark, sf_dir, "documents")
    mean_w = d.agg(F.avg("n_chars")).first()[0]
    mean_sampled = sum(r.w for r in rows) / len(rows)
    assert mean_sampled >= mean_w  # longer docs are proportionally likelier


def test_simpson_diversity_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q154_corpus_simpson_diversity").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.simpson <= 1.0
        assert r.collide_pairs <= r.total_pairs
        assert r.n_types <= r.n_tokens


def test_stream_python_sink_conserves_rows(spark, sf_dir):
    """Every event row must survive the stream → manifest → readback trip
    exactly once (the exactly-once sink contract)."""
    out = {r.event_type: r.n_rows for r in _run(spark, sf_dir, "q155_stream_python_sink").collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out == exact


def test_ohlc_bounds_and_conservation(spark, sf_dir):
    rows = _run(spark, sf_dir, "q156_ohlc_downsample").collect()
    assert rows
    total = 0
    for r in rows:
        assert r.low <= r.high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n >= 1
        total += r.n
    assert total == load_table(spark, sf_dir, "events").count()


def test_rate_source_closed_form(spark, sf_dir):
    """The drained value range has a closed-form checksum: sum of 0..N-1."""
    from spark_state_provider_spark.operators.streaming_queries import (
        _RATE_BATCHES,
        _RATE_ROWS_PER_BATCH,
    )

    rows = _run(spark, sf_dir, "q157_rate_source_checksum").collect()
    n = _RATE_ROWS_PER_BATCH * _RATE_BATCHES
    assert sum(r.n for r in rows) == n
    assert sum(r.sum_v for r in rows) == n * (n - 1) // 2
    assert len(rows) == 7


def test_state_change_feed_conserves_keys(spark, sf_dir):
    """Summed per-batch inserts == total distinct dedup keys (every key
    enters state exactly once, in exactly one version's changelog)."""
    rows = _run(spark, sf_dir, "q158_state_change_feed").collect()
    from spark_state_provider_spark.operators.streaming_queries import N_BATCHES

    assert {r.batch_id for r in rows} <= set(range(N_BATCHES))
    assert all(r.change_type == "update" for r in rows)
    total = sum(r.n_changes for r in rows)
    exact = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.to_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert total == exact
