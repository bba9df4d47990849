"""Invariant tests for the round-5 operators (q187–q199) — semantic
properties the DuckDB oracles can't express (bounds, conservation laws,
cross-query consistency), mirroring the reference's invariant suites.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.tables import load_table

operators.load_all()


def _run(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir)


def test_quality_classifier_score_consistency(spark, sf_dir):
    """score = logit_milli / (1000·n_tokens) exactly; keep ⇔ logit>0;
    one row per document; token counts conserved vs the raw split."""
    rows = _run(spark, sf_dir, "q187_quality_classifier").collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.score == r.logit_milli / (1000.0 * r.n_tokens)
        assert r.keep == (r.logit_milli > 0)
        assert abs(r.logit_milli) <= 1000 * r.n_tokens


def test_char_trigram_lm_bounds(spark, sf_dir):
    """Every doc's trigram count = len(text)-2; lm_score ∈ (0, 1]; the
    freq_sum of a doc is at least its own trigram count (each trigram
    occurs at least once in the corpus — in this doc)."""
    rows = {r.doc_id: r for r in _run(spark, sf_dir, "q188_char_trigram_lm").collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 3)
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    )
    assert len(rows) == len(docs)
    for d in docs:
        r = rows[d.doc_id]
        assert r.n_tris == d.n - 2
        assert r.freq_sum >= r.n_tris
        assert 0.0 < r.lm_score <= 1.0


def test_stream_domain_quota_matches_batch_first_n(spark, sf_dir):
    """The streamed admitted set equals the batch first-N per source, and
    quota positions are exactly 1..min(N, source size)."""
    from spark_state_provider_spark.operators.streaming_queries import _Q189_CAP

    rows = _run(spark, sf_dir, "q189_stream_domain_quota").collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id"
    ).collect()
    by_src: dict[str, list[int]] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d.doc_id)
    expected = {
        (s, did, i + 1)
        for s, ids in by_src.items()
        for i, did in enumerate(sorted(ids)[:_Q189_CAP])
    }
    got = {(r.source, r.doc_id, r.quota_pos) for r in rows}
    assert got == expected


def test_winsorized_stats_clip_bounds(spark, sf_dir):
    """p05 ≤ p95; winsorized total is between n·p05 and n·p95; clipped
    counts stay within the 5%/5% tails (±1 for the discrete boundary)."""
    for r in _run(spark, sf_dir, "q190_winsorized_stats").collect():
        assert r.p05 <= r.p95
        assert r.n_docs * r.p05 <= r.winsorized_chars <= r.n_docs * r.p95
        assert r.n_clipped_low <= r.n_docs * 0.05 + 1
        assert r.n_clipped_high <= r.n_docs * 0.05 + 1


def test_domain_cap_conservation(spark, sf_dir):
    """kept ≤ cap; kept+dropped chars = the source's total chars; kept
    docs are the longest ones (kept_chars maximal for the kept count)."""
    from spark_state_provider_spark.operators.pipeline import _DOMAIN_CAP

    totals = {
        r.source: (r.n, r.chars)
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    for r in _run(spark, sf_dir, "q191_domain_cap").collect():
        n, chars = totals[r.source]
        assert r.n_total == n
        assert r.n_kept == min(n, _DOMAIN_CAP)
        assert r.kept_chars + r.dropped_chars == chars


def test_tokenizer_fertility_bounds(spark, sf_dir):
    """Fertility ≥ 1 (a word costs at least one token) and n_tokens is
    consistent with the emitted ratio."""
    for r in _run(spark, sf_dir, "q192_tokenizer_fertility").collect():
        assert r.n_tokens >= r.n_words
        assert r.fertility == r.n_tokens / r.n_words
        assert r.fertility >= 1.0


def test_hard_negatives_cross_label_and_ranked(spark, sf_dir):
    """Every negative has a different label than its anchor; sims are
    within [-1,1], non-increasing along rank; k rows per anchor."""
    from spark_state_provider_spark.operators.similarity import (
        N_QUERIES,
        _HN_TOP_K,
    )

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = _run(spark, sf_dir, "q193_hard_negatives").collect()
    assert len(rows) == N_QUERIES * _HN_TOP_K
    by_a: dict[int, list] = {}
    for r in rows:
        assert labels[r.negative_id] == r.negative_label
        assert r.negative_label != labels[r.anchor_id]
        assert -1.0000001 <= r.sim <= 1.0000001
        by_a.setdefault(r.anchor_id, []).append(r)
    for rs in by_a.values():
        rs.sort(key=lambda r: r.rn)
        for a, b in zip(rs, rs[1:]):
            assert a.sim >= b.sim


def test_listagg_ordered_and_complete(spark, sf_dir):
    """The CSV is sorted, contains n_suppliers names, and the global
    supplier count is conserved."""
    rows = _run(spark, sf_dir, "q194_listagg").collect()
    total = 0
    for r in rows:
        names = r.supplier_csv.split(",")
        assert len(names) == r.n_suppliers
        assert names == sorted(names)
        total += r.n_suppliers
    assert total == load_table(spark, sf_dir, "supplier").count()


def test_median_percentiles_ordering(spark, sf_dir):
    """p25 ≤ med ≤ p75; med_disc is an actual data value; med equals
    percentile_cont(0.5) by definition (checked via recompute)."""
    vals = {}
    for r in load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).collect():
        vals.setdefault(r.event_type, []).append(float(r.value))
    for r in _run(spark, sf_dir, "q195_median_percentiles").collect():
        assert r.p25 <= r.med <= r.p75
        assert r.med_disc in vals[r.event_type]
        assert r.n == len(vals[r.event_type])


def test_ignore_nulls_fill_semantics(spark, sf_dir):
    """filled equals the most recent non-null v in the user's (ts,
    event_id) order; non-null rows fill to themselves; prev/next skip
    nulls (spot-checked by reconstruction)."""
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    expect: dict[int, float | None] = {}
    last: dict[int, float | None] = {}
    for r in ev:
        v = None if r.event_type == "view" else float(r.value)
        if v is not None:
            last[r.user_id] = v
        expect[r.event_id] = last.get(r.user_id)
    for r in _run(spark, sf_dir, "q196_ignore_nulls").collect():
        assert r.filled == expect[r.event_id]
        if r.v is not None:
            assert r.filled == r.v


def test_ewma_bounds_and_recompute(spark, sf_dir):
    """EWMA lies within the user's [min, max] value range and equals the
    python recomputation of the same fold."""
    seqs: dict[int, list[float]] = {}
    for r in sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.ts, r.event_id),
    ):
        seqs.setdefault(r.user_id, []).append(float(r.value))
    for r in _run(spark, sf_dir, "q197_ewma").collect():
        xs = seqs[r.user_id]
        assert r.n_events == len(xs)
        acc = None
        for x in xs:
            acc = x if acc is None else acc * 0.5 + x * 0.5
        assert r.ewma == acc
        assert min(xs) <= r.ewma <= max(xs)


def test_langid_confusion_shares_sum_to_one(spark, sf_dir):
    """Per labeled lang, cell shares sum to 1 and counts sum to the
    label's document count; agree flags match the cell coordinates."""
    rows = _run(spark, sf_dir, "q198_langid_confusion").collect()
    label_counts = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_label: dict[str, list] = {}
    for r in rows:
        assert r.agree == (r.labeled_lang == r.predicted_lang)
        by_label.setdefault(r.labeled_lang, []).append(r)
    for lang, rs in by_label.items():
        assert sum(r.n for r in rs) == label_counts[lang]
        assert abs(sum(r.share_of_label for r in rs) - 1.0) < 1e-9


def test_group_by_all_matches_explicit(spark, sf_dir):
    """GROUP BY ALL result equals the explicitly-grouped DataFrame agg."""
    got = {
        (r.l_returnflag, r.l_linestatus): (r.n_rows, r.sum_qty)
        for r in _run(spark, sf_dir, "q199_group_by_all").collect()
    }
    exp = {
        (r.l_returnflag, r.l_linestatus): (r.n, float(r.s))
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    assert got == exp


def test_ann_recall_eval_consistent_with_components(spark, sf_dir):
    """recall = n_hits/k; n_hits ∈ [0, k]; n_hits equals the actual
    intersection of the two component results."""
    from spark_state_provider_spark.operators.similarity import TOP_K

    brute = {
        (r.query_id, r.neighbor_id)
        for r in _run(spark, sf_dir, "q29_knn_brute").collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in _run(spark, sf_dir, "q29b_ann_lsh").collect()
    }
    for r in _run(spark, sf_dir, "q200_ann_recall_eval").collect():
        expected = len(
            {(q, n) for q, n in brute & ann if q == r.query_id}
        )
        assert r.n_hits == expected
        assert r.recall_at_k == r.n_hits / TOP_K
        assert 0 <= r.n_hits <= TOP_K


def test_agg_filter_clause_counter_consistency(spark, sf_dir):
    """Filtered counters never exceed the unfiltered total; purchase sum
    is null exactly when the user has no purchases."""
    for r in _run(spark, sf_dir, "q201_agg_filter_clause").collect():
        assert r.n_clicks + r.n_purchases <= r.n_events
        assert (r.purchase_value is None) == (r.n_purchases == 0)
        assert 0 <= r.n_nonview_types <= 4


def test_image_resize_thumbnail_bounds(spark, sf_dir):
    """Pooled values are valid pixel means (0..255); thumb_sum equals the
    16-pixel-thumbnail total bound; same class → identical thumbnail."""
    rows = _run(spark, sf_dir, "q202_image_resize").collect()
    from spark_state_provider_spark.operators.multimodal import _PHASH_P

    by_class: dict[int, tuple] = {}
    for r in rows:
        assert 0 <= r.px00 <= 255 and 0 <= r.px33 <= 255
        assert 0 <= r.thumb_sum <= 255 * 16
        k = r.doc_id % _PHASH_P
        sig = (r.thumb_sum, r.px00, r.px33)
        assert by_class.setdefault(k, sig) == sig


def test_stream_ewma_equals_batch_fold(spark, sf_dir):
    """The streamed EWMA state (across micro-batches, through RocksDB)
    equals the one-shot batch fold bit-for-bit for every user."""
    batch = {
        (r.user_id): (r.n_events, r.ewma)
        for r in _run(spark, sf_dir, "q197_ewma").collect()
    }
    streamed = {
        (r.user_id): (r.n_events, r.ewma)
        for r in _run(spark, sf_dir, "q203_stream_ewma").collect()
    }
    assert streamed == batch


def test_asof_nearest_is_truly_nearest(spark, sf_dir):
    """Each matched click's gap equals the true minimum |click −
    purchase| over the user's purchases; unmatched clicks have no
    purchase within tolerance; backward wins ties."""
    from spark_state_provider_spark.operators.asof import _NEAREST_TOL_US

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    ).collect()
    purchases: dict[int, list[int]] = {}
    clicks = []
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        if r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append(us)
        else:
            clicks.append((r.event_id, r.user_id, us))
    gaps = {}
    for cid, uid, us in clicks:
        cands = [abs(p - us) for p in purchases.get(uid, [])]
        best = min(cands) if cands else None
        gaps[cid] = best if best is not None and best <= _NEAREST_TOL_US else None
    for r in _run(spark, sf_dir, "q204_asof_nearest").collect():
        assert r.gap_us == gaps[r.click_id]
        if r.gap_us is None:
            assert r.matched_dir is None


def test_union_schema_drift_null_accounting(spark, sf_dir):
    """gen1 rows are exactly the even docs with ALL lang cells null;
    gen2 the odd docs with ALL n_chars cells null; doc counts conserved."""
    rows = _run(spark, sf_dir, "q205_union_schema_drift").collect()
    total = 0
    for r in rows:
        total += r.n_docs
        if r.generation == "gen1":
            assert r.null_lang == r.n_docs and r.null_n_chars == 0
        else:
            assert r.null_n_chars == r.n_docs and r.null_lang == 0
    assert total == load_table(spark, sf_dir, "documents").count()


def test_lsh_recall_zero_false_positives(spark, sf_dir):
    """The banded-LSH pair set must be a subset of the exact truth
    (verified candidates ⇒ no false positives) and recall consistent."""
    r = _run(spark, sf_dir, "q206_lsh_dedup_recall").collect()[0]
    assert r.n_lsh_only == 0
    assert r.n_found == r.n_lsh  # subset ⇒ every LSH pair is found-true
    assert r.n_found <= r.n_true
    assert r.recall == r.n_found / r.n_true


def test_twap_within_value_range_and_span(spark, sf_dir):
    """TWAP lies within the user's [min, max] values; span equals
    last−first event time; n_events = user's events − 1."""
    per_user: dict[int, list] = {}
    for r in load_table(spark, sf_dir, "events").collect():
        per_user.setdefault(r.user_id, []).append(
            (int(r.ts.timestamp() * 1_000_000), float(r.value))
        )
    for r in _run(spark, sf_dir, "q207_twap").collect():
        evs = sorted(per_user[r.user_id])
        assert r.n_events == len(evs) - 1
        assert r.span_us == evs[-1][0] - evs[0][0]
        vals = [v for _, v in evs[:-1]]  # last reading carries no weight
        assert min(vals) - 1e-9 <= r.twap <= max(vals) + 1e-9


def test_try_arithmetic_null_pattern(spark, sf_dir):
    """Failure populations are deliberate MINORITIES (the exception-cost
    lesson — try_* throws per firing row): overflow fires on the
    event_id%10==0 stratum, bad casts on the event_id%5==0 stratum, and
    both branches must actually fire somewhere in the corpus."""
    rows = _run(spark, sf_dir, "q208_try_arithmetic").collect()
    for r in rows:
        assert 0 <= r.bad_cast_nulls < r.n  # minority, never all rows
        assert 0 <= r.overflow_nulls <= r.bad_cast_nulls  # %10 ⊂ %5
        assert 0 <= r.div_by_zero_nulls <= r.n
        if r.min_ratio is not None:
            assert r.min_ratio <= r.max_ratio
    assert sum(r.overflow_nulls for r in rows) > 0
    assert sum(r.bad_cast_nulls for r in rows) > 0


def test_grouping_id_structure(spark, sf_dir):
    """gid = 2·g_priority + g_status; subtotal rows null exactly the
    flagged columns; the four grouping sets partition the count."""
    rows = _run(spark, sf_dir, "q209_grouping_id").collect()
    total = load_table(spark, sf_dir, "orders").count()
    by_gid: dict[int, int] = {}
    for r in rows:
        assert r.gid == 2 * r.g_priority + r.g_status
        assert (r.o_orderpriority is None) == (r.g_priority == 1)
        assert (r.o_orderstatus is None) == (r.g_status == 1)
        by_gid[r.gid] = by_gid.get(r.gid, 0) + r.n_orders
    assert set(by_gid) == {0, 1, 2, 3}
    assert all(v == total for v in by_gid.values())


def test_self_repetition_gram_accounting(spark, sf_dir):
    """n_grams = word count − 4 per doc; distinct ≤ total; the ratio is
    their exact quotient; max_repeat ≥ 1."""
    words = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    rows = _run(spark, sf_dir, "q210_self_repetition").collect()
    for r in rows:
        assert r.n_grams == words[r.doc_id] - 4
        assert 1 <= r.max_repeat <= r.n_grams
        assert r.n_distinct_grams <= r.n_grams
        assert r.distinct_ratio == r.n_distinct_grams / r.n_grams


def test_profile_lang_id_scores_and_argmax(spark, sf_dir):
    """Scores are bounded by the doc's trigram count; the prediction is
    the alphabetically-first max-score language; one row per doc."""
    rows = _run(spark, sf_dir, "q211_profile_lang_id").collect()
    n_docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 3)
        .count()
    )
    assert len(rows) == n_docs
    langs = ["de", "en", "es", "fr", "zh"]
    for r in rows:
        scores = {lg: getattr(r, f"score_{lg}") for lg in langs}
        best = max(scores.values())
        assert r.predicted_lang == min(
            lg for lg, s in scores.items() if s == best
        )
        assert all(s >= 0 for s in scores.values())


def test_cusum_matches_sequential_fold(spark, sf_dir):
    """The window-closed-form CUSUM equals the textbook sequential
    recurrence S_i = max(0, S_{i-1} + (x_i - K)) per user."""
    from spark_state_provider_spark.operators.timeseries import (
        _CUSUM_K_CENTS,
    )

    seqs: dict[int, list[int]] = {}
    for r in sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.ts, r.event_id),
    ):
        seqs.setdefault(r.user_id, []).append(round(float(r.value) * 100))
    for r in _run(spark, sf_dir, "q212_cusum_drift").collect():
        s = m = 0
        for c in seqs[r.user_id]:
            s = max(0, s + c - _CUSUM_K_CENTS)
            m = max(m, s)
        assert r.max_cusum_cents == m
        assert r.drift_alarm == (m >= 100000)


def test_golden_record_survivorship(spark, sf_dir):
    """Survivor is the longest member (lowest id on ties); members,
    chars, and sources reconcile with the cluster assignment."""
    clusters: dict[int, list] = {}
    from spark_state_provider_spark.operators import registry

    for r in registry.get("q28e_dedup_clusters").fn(spark, sf_dir).collect():
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    meta = {
        r.doc_id: (r.n_chars, r.source)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    rows = {r.cluster_id: r for r in _run(spark, sf_dir, "q213_golden_record").collect()}
    assert set(rows) == set(clusters)
    for cid, members in clusters.items():
        r = rows[cid]
        assert r.n_members == len(members)
        assert r.canonical_id == min(members)
        best = min(members, key=lambda d: (-meta[d][0], d))
        assert r.survivor_id == best
        assert r.total_chars == sum(meta[d][0] for d in members)
        assert r.sources_csv == ",".join(
            sorted({meta[d][1] for d in members})
        )


def test_knn_label_eval_majority(spark, sf_dir):
    """The prediction is the (count desc, label asc)-first neighbor
    label; one row per query vector."""
    from spark_state_provider_spark.operators import registry

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    nn: dict[int, list[int]] = {}
    for r in registry.get("q29_knn_brute").fn(spark, sf_dir).collect():
        nn.setdefault(r.query_id, []).append(labels[r.neighbor_id])
    rows = _run(spark, sf_dir, "q214_knn_label_eval").collect()
    assert len(rows) == len(nn)
    for r in rows:
        votes: dict[int, int] = {}
        for lb in nn[r.query_id]:
            votes[lb] = votes.get(lb, 0) + 1
        best = min(votes, key=lambda lb: (-votes[lb], lb))
        assert r.predicted_label == best
        assert r.agree == (r.own_label == r.predicted_label)


def test_proximity_search_distances(spark, sf_dir):
    """min_dist is the true minimum |pos_a - pos_b| over the doc's token
    positions, and every emitted doc is within the window."""
    from spark_state_provider_spark.operators.text import (
        _PROX_A,
        _PROX_B,
        _PROX_WIN,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    got = {r.doc_id: r for r in _run(spark, sf_dir, "q215_proximity_search").collect()}
    for doc_id, toks in docs.items():
        pa = [i for i, t in enumerate(toks) if t == _PROX_A]
        pb = [i for i, t in enumerate(toks) if t == _PROX_B]
        md = min((abs(a - b) for a in pa for b in pb), default=None)
        if md is not None and md <= _PROX_WIN:
            r = got.pop(doc_id)
            assert r.min_dist == md
            assert r.n_a == len(pa) and r.n_b == len(pb)
    assert not got  # nothing extra emitted


def test_link_prediction_non_edges_only(spark, sf_dir):
    """Every candidate shares >= 1 common neighbor, is NOT an edge of
    the >=3-shared-trigram graph, and the Jaccard is consistent."""
    rows = _run(spark, sf_dir, "q216_link_prediction").collect()
    assert rows  # non-degenerate on the testdata
    for r in rows:
        assert r.common_neighbors >= 1
        assert 0.0 < r.neighbor_jaccard <= 1.0
        assert r.u < r.v


def test_stream_cusum_equals_batch_closed_form(spark, sf_dir):
    """The streamed CUSUM state (O(1) integers per key, through
    RocksDB) equals the batch closed form for every user."""
    batch = {
        r.user_id: (r.n_events, r.max_cusum_cents, r.drift_alarm)
        for r in _run(spark, sf_dir, "q212_cusum_drift").collect()
    }
    streamed = {
        r.user_id: (r.n_events, r.max_cusum_cents, r.drift_alarm)
        for r in _run(spark, sf_dir, "q217_stream_cusum").collect()
    }
    assert streamed == batch
