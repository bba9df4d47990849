"""Round-3 operator additions: span-level dedup (q111), SemDeDup (q112),
cross-source overlap governance (q113). Value-vs-oracle is covered by
tests/test_full_registry_oracle.py; these tests pin the STRUCTURAL
properties the oracle can't express."""

import pyspark.sql.functions as F
import pytest

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry

operators.load_all()


@pytest.fixture(scope="module")
def span(spark, sf_dir):
    return registry.get("q111_span_dedup").fn(spark, sf_dir).collect()


def test_span_dedup_planted_neardups_have_high_dup_frac(span, spark, sf_dir):
    """Planted near-dup docs share long runs of text, so their duplicated
    {SPAN_W}-window fraction must dominate the corpus background."""
    pairs = registry.get("q28b_minhash_lsh").fn(spark, sf_dir).collect()
    dup_ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert dup_ids, "testdata should contain planted near-duplicates"
    frac = {r["doc_id"]: r["dup_frac"] for r in span}
    near = [frac[i] for i in dup_ids if i in frac]
    rest = [f for d, f in frac.items() if d not in dup_ids]
    assert near and min(near) > 0.5, sorted(near)[:5]
    assert sum(near) / len(near) > sum(rest) / max(len(rest), 1)


def test_span_dedup_fraction_bounds(span):
    for r in span:
        assert 0 <= r["dup_windows"] <= r["n_windows"]
        assert abs(r["dup_frac"] - r["dup_windows"] / r["n_windows"]) < 1e-12


def test_semdedup_drops_are_cluster_local_and_keep_lowest(spark, sf_dir):
    """Every cluster keeps its lowest-id member (it can never be dropped),
    and a dropped vector implies a kept lower-id member in-cluster."""
    rows = registry.get("q112_semdedup").fn(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cid"], []).append(r)
    assert len(by_cluster) > 1
    for members in by_cluster.values():
        lowest = min(m["vec_id"] for m in members)
        for m in members:
            if m["vec_id"] == lowest:
                assert not m["dropped"]


def test_semdedup_agrees_with_brute_cosine(spark, sf_dir):
    """A dropped vector must actually have a >=tau lower-id neighbor in
    its cluster (re-derived with an independent driver-side cosine)."""
    import math

    from spark_state_provider_spark.operators.similarity import SEMDEDUP_TAU

    rows = registry.get("q112_semdedup").fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cid"], []).append(r)
    checked = 0
    for members in by_cluster.values():
        ids = sorted(m["vec_id"] for m in members)
        flags = {m["vec_id"]: m["dropped"] for m in members}
        for v in ids:
            want = any(
                cos(emb[u], emb[v]) >= SEMDEDUP_TAU for u in ids if u < v
            )
            assert flags[v] == want, (v, flags[v], want)
            checked += 1
    assert checked == len(rows)


def test_source_overlap_matches_pair_graph(spark, sf_dir):
    """The governance rollup must be exactly the q28b pair graph grouped
    by (source, source) with normalized orientation."""
    pairs = registry.get("q28b_minhash_lsh").fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    want: dict[tuple, int] = {}
    for p in pairs:
        a, b = sorted((docs[p["id_a"]], docs[p["id_b"]]))
        want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r["source_a"], r["source_b"]): r["neardup_pairs"]
        for r in registry.get("q113_source_overlap").fn(spark, sf_dir).collect()
    }
    assert got == want and sum(got.values()) == len(pairs)


def test_q97_invariant_under_tiny_arrow_chunks(spark, sf_dir):
    """The ADVICE-r2 chunk-ordering fix, exercised for real: shrink
    Arrow batches so applyInPandasWithState actually splits groups into
    many chunks — the flagged anomaly set must not change."""
    fn = registry.get("q97_stream_rolling_anomaly").fn
    key = lambda r: (r["event_id"], r["user_id"], r["cents"], r["n"])  # noqa: E731
    base = sorted(key(r) for r in fn(spark, sf_dir).collect())
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "7")  # force multi-chunk groups
    try:
        tiny = sorted(key(r) for r in fn(spark, sf_dir).collect())
    finally:
        if prev is not None:
            spark.conf.set(conf, prev)
        else:
            spark.conf.unset(conf)
    assert base and tiny == base


def test_ttl_fold_invariant_under_tiny_arrow_chunks(spark, sf_dir):
    """Same exercise for the TTL fold: the expiry decision must be
    batch-granular, independent of the Arrow chunk split."""
    fn = registry.get("q25s_stream_ttl").fn
    key = lambda r: (r["user_id"], r["total_visits"], r["first_event_id"],  # noqa: E731
                     r["last_event_id"])
    base = sorted(key(r) for r in fn(spark, sf_dir).collect())
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "5")
    try:
        tiny = sorted(key(r) for r in fn(spark, sf_dir).collect())
    finally:
        if prev is not None:
            spark.conf.set(conf, prev)
        else:
            spark.conf.unset(conf)
    assert base and tiny == base


def test_bpe_merges_are_plausible_and_ranked(spark, sf_dir):
    rows = registry.get("q119_bpe_merge_candidates").fn(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0
    assert all(len(r["pair"]) == 2 for r in rows)


def test_quality_funnel_is_monotone_and_conserves(spark, sf_dir):
    rows = {r["gate"]: r for r in
            registry.get("q120_quality_funnel").fn(spark, sf_dir).collect()}
    order = ["g1_length_band", "g2_min_tokens", "g3_repetition_cap",
             "g4_lang_en"]
    assert set(rows) == set(order)
    prev_out = None
    for gate in order:
        r = rows[gate]
        assert r["n_dropped"] == r["n_in"] - r["n_out"] >= 0
        if prev_out is not None:
            assert r["n_in"] == prev_out  # funnel chains exactly
        prev_out = r["n_out"]
