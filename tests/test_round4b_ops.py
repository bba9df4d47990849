"""Invariant tests for the round-4 second-batch operators (q150–q177) —
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


def test_neyman_shares_sum_and_exactness(spark, sf_dir):
    """Shares ≤ 10000 in total (floor division loses ≤1bp per stratum);
    var_num is the exact N·Σx²−(Σx)² identity (cross-checked in Python)."""
    rows = _run(spark, sf_dir, "q159_neyman_allocation").collect()
    assert rows
    assert sum(r.share_bp for r in rows) <= 10000
    assert sum(r.share_bp for r in rows) >= 10000 - len(rows)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src: dict[str, list[int]] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.n_chars)
    for r in rows:
        xs = by_src[r.source]
        assert r.var_num == len(xs) * sum(x * x for x in xs) - sum(xs) ** 2
        assert r.sd_floor * r.sd_floor <= r.var_num < (r.sd_floor + 1) ** 2


def test_fanout_sinks_always_agree(spark, sf_dir):
    rows = _run(spark, sf_dir, "q160_stream_fanout_consistency").collect()
    assert rows and all(r.sinks_agree for r in rows)


def test_dynamic_gap_sessions_vs_fixed(spark, sf_dir):
    """A 45/10-minute dynamic gap must produce at least as many sessions
    as a uniform 45-minute gap (shorter gaps only ever split) and at most
    as many as a uniform 10-minute gap."""
    from pyspark.sql import functions as F2

    e = load_table(spark, sf_dir, "events")

    def n_sessions(gap):
        return (
            e.groupBy(F2.session_window("ts", gap).alias("sw"), "user_id")
            .agg(F2.count("*").alias("n"))
            .count()
        )

    dyn = _run(spark, sf_dir, "q161_dynamic_gap_sessions").count()
    assert n_sessions("45 minutes") <= dyn <= n_sessions("10 minutes")


def test_partition_evolution_conserves_rows(spark, sf_dir):
    out = _run(spark, sf_dir, "q162_partition_evolution")
    total = out.agg(F.sum("n")).first()[0]
    exact = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click"))
        .count()
    )
    assert total == exact


def test_late_data_strictly_undercounts(spark, sf_dir):
    """The out-of-order replay must drop SOME late rows (the oracle's
    kept-set is strictly smaller than the raw count over emitted
    windows), or the query isn't testing anything."""
    out = _run(spark, sf_dir, "q163_late_data_accounting")
    emitted = {r.window_start: r.n_events for r in out.collect()}
    raw = {
        r.w: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").start.alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert emitted, "no windows emitted"
    assert all(emitted[w] <= raw[w] for w in emitted)
    assert sum(emitted.values()) < sum(raw[w] for w in emitted)


def test_good_turing_mass_conserves_tokens(spark, sf_dir):
    """Σ r·N_r over the table == total token count per language."""
    rows = _run(spark, sf_dir, "q164_good_turing_counts").collect()
    mass: dict[str, int] = {}
    for r in rows:
        mass[r.lang] = mass.get(r.lang, 0) + r.mass
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert mass == {r.lang: r.n for r in tok}


def test_phash_clusters_partition_corpus(spark, sf_dir):
    from spark_state_provider_spark.operators.multimodal import _PHASH_P

    rows = _run(spark, sf_dir, "q165_image_phash").collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert len(rows) == min(_PHASH_P, n_docs)  # distinct planted patterns


def test_restart_adds_nothing(spark, sf_dir):
    out = _run(spark, sf_dir, "q166_stream_restart_exactly_once")
    total = out.agg(F.sum("n_rows")).first()[0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_sql_udf_plan_has_no_python(spark, sf_dir):
    """SQL UDFs must inline — the plan may contain no Python eval node."""
    from spark_state_provider_spark.plans.explain import plan_string

    plan = plan_string(_run(spark, sf_dir, "q167_sql_scalar_udf"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_maintenance_covers_corpus(spark, sf_dir):
    """Every vector indexed exactly once; centroid ids obey the fixed
    rule the oracle hardcodes (guards the constant against drift)."""
    from spark_state_provider_spark.operators.similarity import (
        _IVF_CENT_MAX,
        CENTROID_MOD,
    )

    assert CENTROID_MOD == 50 and _IVF_CENT_MAX == 500  # baked in q170 oracle
    rows = _run(spark, sf_dir, "q170_stream_ivf_maintenance").collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vecs
    for r in rows:
        assert r.cid % CENTROID_MOD == 0 and r.cid < _IVF_CENT_MAX


def test_collocation_lift_support_and_bounds(spark, sf_dir):
    from spark_state_provider_spark.operators.text import _COLLOC_MIN_SUP

    rows = _run(spark, sf_dir, "q171_collocation_lift").collect()
    assert rows
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.c_xy >= _COLLOC_MIN_SUP
        assert abs(r.lift - r.lift_num / r.lift_den) < 1e-12


def test_chained_stateful_equals_batch(spark, sf_dir):
    """Two stateful operators in one query: result equals the batch
    distinct-actor count for every emitted window (subset of raw hours)."""
    out = {r.window_start: r.n_distinct_actors
           for r in _run(spark, sf_dir, "q172_chained_stateful").collect()}
    batch = {
        r.w: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").start.alias("w"))
        .agg(F.count_distinct("user_id", "event_type").alias("n"))
        .collect()
    }
    assert out
    for w, n in out.items():
        assert batch[w] == n


def test_sql_tvf_matches_inline(spark, sf_dir):
    """The TVF-built aggregate equals the hand-inlined DataFrame query."""
    out = {r.event_type: (r.n, r.sum_cents)
           for r in _run(spark, sf_dir, "q173_sql_table_function").collect()}
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("value") >= 10.0) & (F.col("value") < 60.0)
    )
    inline = {
        r.event_type: (r.n, r.c)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    assert out == inline


def test_kcore_survivors_have_k_degree_within_core(spark, sf_dir):
    """Every survivor's reported degree ≥ k, and the survivor set is a
    fixpoint-approximation: degrees are counted over the PREVIOUS round's
    active set, so survivors can only lose degree in later rounds —
    re-pruning the survivor-induced subgraph removes no one with d ≥ k
    already verified at the last round."""
    from spark_state_provider_spark.operators.graph import _KCORE_K

    rows = _run(spark, sf_dir, "q174_kcore_pruning").collect()
    assert rows
    for r in rows:
        assert r.degree >= _KCORE_K


def test_state_export_equals_live_state(spark, sf_dir):
    """The exported KV copy must equal the batch aggregate exactly (the
    external consumer sees committed state, nothing more or less)."""
    out = {r.event_type: r.n_events
           for r in _run(spark, sf_dir, "q175_state_export_kv").collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert out == exact


def test_null_semantics_all_hold(spark, sf_dir):
    rows = _run(spark, sf_dir, "q176_null_semantics").collect()
    assert len(rows) == 6
    assert all(r.holds for r in rows)


def test_ddl_defaults_fill_every_row(spark, sf_dir):
    rows = _run(spark, sf_dir, "q177_ddl_column_defaults").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.quality == "unreviewed" and r.region == "global"
    assert r.n == load_table(spark, sf_dir, "events").count()


def test_merkle_root_is_order_invariant_and_sensitive(spark, sf_dir):
    """Same corpus ⇒ same root at any parallelism (run twice, compare);
    root differs from a root computed over a 1-doc-smaller corpus."""
    a = {r.node: r.h for r in _run(spark, sf_dir, "q178_merkle_tree_integrity").collect()}
    b = {r.node: r.h for r in _run(spark, sf_dir, "q178_merkle_tree_integrity").collect()}
    assert a == b and "ROOT" in a
    # tamper-evidence: recompute leaves without doc 0 -> different root
    from spark_state_provider_spark.operators.pipeline import _MERKLE_FAN
    import hashlib

    docs = sorted(
        (r.doc_id, r.text)
        for r in load_table(spark, sf_dir, "documents").collect()
    )
    def md5(s): return hashlib.md5(s.encode()).hexdigest()
    def root_of(items):
        leaf = [(i // _MERKLE_FAN, i, md5(f"{i}:{md5(t)}")) for i, t in items]
        l1 = {}
        for b1, i, h in sorted(leaf, key=lambda x: x[1]):
            l1.setdefault(b1, []).append(h)
        l1h = {b1: md5("".join(hs)) for b1, hs in l1.items()}
        l2 = {}
        for b1 in sorted(l1h):
            l2.setdefault(b1 // _MERKLE_FAN, []).append(l1h[b1])
        l2h = {b2: md5("".join(hs)) for b2, hs in l2.items()}
        return md5("".join(l2h[b2] for b2 in sorted(l2h)))
    assert a["ROOT"] == root_of(docs)  # independent python recomputation
    assert a["ROOT"] != root_of(docs[1:])


def test_output_modes_agree_everywhere(spark, sf_dir):
    rows = _run(spark, sf_dir, "q179_stream_output_modes").collect()
    assert rows and all(r.modes_agree for r in rows)


def test_packing_curve_monotone(spark, sf_dir):
    """Bigger budgets ⇒ fewer packs; utilization stays in (0, 1]; pack
    capacity always covers the tokens."""
    rows = sorted(
        _run(spark, sf_dir, "q180_packing_efficiency_curve").collect(),
        key=lambda r: r.budget,
    )
    assert len(rows) == 3
    for a, b in zip(rows, rows[1:]):
        assert a.n_packs >= b.n_packs
        assert a.total_tokens == b.total_tokens
    for r in rows:
        assert 0.0 < r.utilization <= 1.0
        assert r.n_packs * r.budget >= r.total_tokens


def test_session_timeout_subset_of_batch_sessions(spark, sf_dir):
    """Every emitted session must exist in batch sessionization; only the
    still-open watermark tail may be missing; timers and event-closes
    never invent or merge sessions."""
    import datetime

    rows = _run(spark, sf_dir, "q181_session_timeout_state").collect()
    assert rows
    ev = sorted(
        (r.user_id, r.ts)
        for r in load_table(spark, sf_dir, "events").collect()
    )
    gap = datetime.timedelta(minutes=30)
    sess: dict[int, list] = {}
    for uid, ts in ev:
        s = sess.setdefault(uid, [])
        if not s or ts - s[-1][1] >= gap:
            s.append([ts, ts, 1])
        else:
            s[-1][1] = ts
            s[-1][2] += 1
    batch = {
        (uid, s[0], s[1], s[2]) for uid, ss in sess.items() for s in ss
    }
    emitted = {
        (r.user_id, r.session_start, r.last_event_ts, r.n_events)
        for r in rows
    }
    assert emitted <= batch
    missing = batch - emitted
    wm = max(ts for _, ts in ev) - gap
    for uid, start, last, n in missing:  # only open tails may be held back
        assert last + gap > wm


def test_full_outer_supersets_left_and_inner(spark, sf_dir):
    """Full-outer emitted rows must contain the inner matches exactly
    once and null-pad each side at most once per unmatched id."""
    rows = _run(spark, sf_dir, "q182_stream_stream_full_outer").collect()
    matched = [(r.click_id, r.purchase_id) for r in rows
               if r.click_id is not None and r.purchase_id is not None]
    left_nulls = [r.click_id for r in rows if r.purchase_id is None]
    right_nulls = [r.purchase_id for r in rows if r.click_id is None]
    assert len(left_nulls) == len(set(left_nulls))
    assert len(right_nulls) == len(set(right_nulls))
    # a null-padded id must not also appear matched
    matched_clicks = {c for c, _ in matched}
    matched_purch = {p for _, p in matched}
    assert not (set(left_nulls) & matched_clicks)
    assert not (set(right_nulls) & matched_purch)
    assert matched and len(set(matched)) == len(matched)


def test_cms_one_sided_and_tight_on_heavy_hitters(spark, sf_dir):
    """CMS never underestimates; exact counts match an independent
    recomputation; the estimate is finite and >= exact for every probe."""
    rows = _run(spark, sf_dir, "q183_count_min_sketch").collect()
    assert rows
    exact = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.never_underestimates
        assert r.exact_n == exact[r.user_id]
        assert r.cms_n >= r.exact_n


def test_incremental_merkle_equals_batch(spark, sf_dir):
    """The streamed, incrementally-maintained tree must be byte-identical
    to the from-scratch q178 tree — the invariant that makes continuous
    integrity auditing sound."""
    inc = {r.node: r.h
           for r in _run(spark, sf_dir, "q184_stream_merkle_maintenance").collect()}
    batch = {r.node: r.h
             for r in _run(spark, sf_dir, "q178_merkle_tree_integrity").collect()}
    assert inc == batch


def test_bloom_no_false_negatives(spark, sf_dir):
    rows = {r.is_member: r for r in _run(spark, sf_dir, "q185_bloom_filter_explicit").collect()}
    m = rows[True]
    assert m.n_hits == m.n_probes and m.n_false_positives == 0
    nm = rows[False]
    assert nm.n_false_positives == nm.n_hits  # every non-member hit is an FP
    assert nm.n_false_positives < nm.n_probes  # filter actually filters


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir):
    """Brute-force dominance check over the collected part table."""
    sky = {(r.p_partkey) for r in _run(spark, sf_dir, "q186_skyline_pareto").collect()}
    parts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    def dominated(x):
        return any(
            y[1] <= x[1] and y[2] <= x[2] and (y[1] < x[1] or y[2] < x[2])
            for y in parts if y[0] != x[0]
        )
    expect = {x[0] for x in parts if not dominated(x)}
    assert sky == expect
