"""Physical-plan quality gates: the plans that must survive a 100× scale-up.

Each assertion encodes a scale requirement from the build brief: filters
reach the parquet scan, projections prune the read schema, small dims
broadcast, top-k never globally sorts, aggregates partial-aggregate
map-side, and nothing ever falls back to a cartesian product.
"""

from __future__ import annotations

import pytest

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.plans.explain import (
    assert_in_plan,
    assert_not_in_plan,
    plan_string,
)

operators.load_all()


def _df(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir)


def test_q01_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q01_pruned_scan"))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "LessThan(l_quantity" in plan
    # read schema must contain only the 4 projected columns
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in rs and "l_comment" not in rs
    assert "l_orderkey" in rs and "l_shipdate" in rs


def test_q04_in_predicate_pushed(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q04_filter"))
    assert "PushedFilters: [" in plan
    assert "In(o_orderpriority" in plan


def test_q05_dims_broadcast(spark, sf_dir):
    plan = assert_in_plan(_df(spark, sf_dir, "q05_broadcast_join"), "BroadcastHashJoin")
    # both dim joins broadcast (tree + detail sections each repeat the node)
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


def test_q08_range_join_broadcasts_band_dim(spark, sf_dir):
    assert_in_plan(
        _df(spark, sf_dir, "q08_range_join"), "BroadcastNestedLoopJoin"
    )
    assert_not_in_plan(_df(spark, sf_dir, "q08_range_join"), "CartesianProduct")


def test_q09_partial_aggregation(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q09_hash_agg"))
    assert "partial_sum" in plan or "Partial" in plan
    assert "HashAggregate" in plan


def test_q14_topk_never_global_sorts(spark, sf_dir):
    assert_in_plan(_df(spark, sf_dir, "q14_topk"), "TakeOrderedAndProject")


def test_q29_knn_broadcasts_queries(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q29_knn_brute"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q28b_lsh_no_cartesian(spark, sf_dir):
    assert_not_in_plan(
        _df(spark, sf_dir, "q28b_minhash_lsh"), "CartesianProduct"
    )


def test_whole_stage_codegen_on_hot_paths(spark, sf_dir):
    # "codegen" explain mode compiles the plan and reports WSCG subtrees
    for name in ("q09_hash_agg", "q18_math", "q30_text_stats"):
        plan = plan_string(_df(spark, sf_dir, name), "codegen")
        assert "WholeStageCodegen subtree" in plan, name


@pytest.mark.parametrize(
    "name",
    ["q06_shuffle_join", "q12_window_rank", "q24_user_statistics"],
)
def test_no_cartesian_anywhere(spark, sf_dir, name):
    assert_not_in_plan(_df(spark, sf_dir, name), "CartesianProduct")


def test_q33_broadcasts_customer_no_cartesian(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q33_tpch_q3"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # top-10 must not globally sort the grouped output
    assert "TakeOrderedAndProject" in plan


def test_q34_all_dims_broadcast(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q34_tpch_q5"))
    assert plan.count("BroadcastExchange") >= 3  # supplier, customer, nation, region
    assert "CartesianProduct" not in plan


def test_q33b_topk_merge_not_global_sort(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q33b_tpch_q10"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q33c_having_semi_join_shape(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q33c_tpch_q18"))
    # the qualifying-order filter must stay a semi join (no row expansion)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q29d_ivf_no_cartesian_on_big_side(spark, sf_dir):
    # the only nested-loop is the broadcast centroid assignment; candidate
    # search and re-rank must stay hash joins / window — never cartesian
    plan = plan_string(_df(spark, sf_dir, "q29d_ivf_ann"))
    assert "CartesianProduct" not in plan


def test_q45_exists_is_semi_join(spark, sf_dir):
    # correlated EXISTS must plan as a left semi join (each order emitted
    # at most once — never a row-expanding inner join + distinct)
    plan = plan_string(_df(spark, sf_dir, "q45_tpch_q4"))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # the quarter filter reaches the orders scan
    assert "PushedFilters: [" in plan


def test_q45b_nation_legs_broadcast(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q45b_tpch_q7"))
    # supplier+nation and customer+nation legs both broadcast; the only
    # shuffle join is lineitem ⋈ orders
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_q45d_outer_join_survives(spark, sf_dir):
    # count(o_orderkey)-over-outer-join semantics: the optimizer must keep
    # LeftOuter (a semi/inner rewrite would drop zero-order customers)
    plan = plan_string(_df(spark, sf_dir, "q45d_tpch_q13"))
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_q45f_anti_join_and_scalar_broadcast(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q45f_tpch_q22"))
    assert "LeftAnti" in plan
    # the 1-row average joins via broadcast nested loop — the one
    # acceptable BNL — and nothing falls back to cartesian
    assert "CartesianProduct" not in plan


def test_q49_bm25_topk_and_broadcast_stats(spark, sf_dir):
    """BM25: corpus stats join must broadcast (single-row agg) and the
    global top-k must be TakeOrderedAndProject, never a full sort."""
    plan = plan_string(_df(spark, sf_dir, "q49_bm25"))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q50_kmeans_broadcasts_centroids(spark, sf_dir):
    """Both Lloyd assignment passes must broadcast the k centroids — a
    shuffle or cartesian on the vector side would not survive 100 TB."""
    plan = plan_string(_df(spark, sf_dir, "q50_kmeans"))
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q52_unigram_vocab_broadcast(spark, sf_dir):
    """The vocabulary-frequency join back onto the token stream must be a
    broadcast hash join (vocab is bounded; the token stream is not)."""
    plan = plan_string(_df(spark, sf_dir, "q52_unigram_lm"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q53_histogram_partial_agg(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q53_histogram"))
    assert "HashAggregate" in plan
    assert "partial" in plan.lower()


def test_q63b_q8_dims_broadcast_no_cartesian(spark, sf_dir):
    """Q8's 8-table tree: every dimension leg broadcasts; only
    lineitem⋈orders may shuffle; nothing degenerates to a cartesian."""
    plan = plan_string(_df(spark, sf_dir, "q63b_tpch_q8"))
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_q63e_q21_single_lineitem_shuffle(spark, sf_dir):
    """Q21's aggregate rewrite: no cartesian, no nested-loop self-joins —
    the EXISTS/NOT EXISTS pair is one orderkey-partitioned aggregation."""
    plan = plan_string(_df(spark, sf_dir, "q63e_tpch_q21"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name", ["q31e_image_header_decode", "q31f_audio_meta"]
)
def test_multimodal_decode_is_shuffle_free(spark, sf_dir, name):
    """Media decode must stay a narrow Arrow map over the scan — any
    Exchange means per-asset work got coupled across partitions."""
    plan = plan_string(_df(spark, sf_dir, name))
    assert "Exchange" not in plan, name
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, name


def test_q10_sketch_trio_partial_aggregates(spark, sf_dir):
    """The sketch queries' whole point is map-side mergeable partials —
    every one must partial-aggregate before its single shuffle."""
    for name in (
        "q10b_approx_distinct",
        "q10d_hll_sketch",
        "q10e_approx_percentile",
        "q10f_approx_top_k",
    ):
        plan = plan_string(_df(spark, sf_dir, name))
        assert "partial" in plan.lower(), name
        assert "CartesianProduct" not in plan, name


def test_q73_q2_correlated_min_no_cartesian(spark, sf_dir):
    """Q2's correlated min decorrelates to a window over the derived-pair
    aggregate — every dim leg broadcasts, nothing nested-loops."""
    plan = plan_string(_df(spark, sf_dir, "q73_tpch_q2"))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q73c_q16_not_in_is_broadcast_anti(spark, sf_dir):
    """Q16's NOT IN must become a broadcast anti join (the excluded set is
    tiny), never a shuffled or nested-loop exclusion."""
    plan = plan_string(_df(spark, sf_dir, "q73c_tpch_q16"))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q73e_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    """Q22: the dormant-customer NOT EXISTS is an anti join and the
    (total, cnt) scalar threshold rides a one-row broadcast."""
    plan = plan_string(_df(spark, sf_dir, "q73e_tpch_q22"))
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q74_pagerank_no_cartesian(spark, sf_dir):
    """Each PageRank superstep is a key join + partial agg — nothing may
    degenerate to a nested loop or cartesian across supersteps."""
    plan = plan_string(_df(spark, sf_dir, "q74_pagerank"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q75_heavy_hitters_candidates_broadcast(spark, sf_dir):
    """The MG candidate pass is a narrow Arrow map; the recount must
    semi-join a BROADCAST candidate set (never shuffle the full scan
    against it)."""
    plan = plan_string(_df(spark, sf_dir, "q75_heavy_hitters"))
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q76_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """The fact scan must carry a dynamic partition filter derived from
    the dim broadcast — otherwise the partitioned layout buys nothing."""
    plan = plan_string(_df(spark, sf_dir, "q76_dynamic_partition_pruning"))
    assert "dynamicpruning" in plan.lower()


def test_q77_chunking_is_shuffle_free(spark, sf_dir):
    """Chunking is tokenize→sequence→explode→slice — a narrow
    row-expanding map with no Exchange and no Python worker."""
    plan = plan_string(_df(spark, sf_dir, "q77_doc_chunking"))
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


def test_q78_incremental_dedup_no_cartesian(spark, sf_dir):
    """The new-batch probe must stay a band-bucket equijoin against the
    corpus index — never a cross product, and verify joins broadcast only
    the candidate pair list."""
    plan = plan_string(_df(spark, sf_dir, "q78_incremental_dedup"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q79_salted_join_shuffles_on_salted_key(spark, sf_dir):
    """The salted join must actually shuffle on (key, salt) — a broadcast
    would make the salt inert — and the per-user agg partial-aggregates."""
    plan = plan_string(_df(spark, sf_dir, "q79_salted_join"))
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_q93_runtime_bloom_filter_injected(spark, sf_dir):
    """Row-level runtime filtering must actually fire: the fact side scans
    behind a might_contain over a bloom_filter_agg built from the filtered
    dim — without it the query silently degrades to a full-fact shuffle."""
    plan = plan_string(_df(spark, sf_dir, "q93_runtime_bloom_join"))
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan


def test_q94_anomaly_single_user_shuffle(spark, sf_dir):
    """The rolling window must ride ONE hash exchange on user_id — a
    global (unpartitioned) window sort would serialize the whole table."""
    plan = plan_string(_df(spark, sf_dir, "q94_rolling_anomaly"))
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan
    # no unpartitioned window: every Sort is preceded by the hash exchange
    assert "SinglePartition" not in plan


def test_q95_audit_single_scan_per_table_and_broadcast_fk(spark, sf_dir):
    """Six scan constraints must ride two aggregate rows (one scan per
    table, reused across the verdict union) and the FK check must
    broadcast the dim keys, never shuffle orders for it."""
    plan = plan_string(_df(spark, sf_dir, "q95_data_quality_audit"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q98_estimate_side_partial_aggregates(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q98_join_size_estimate"))
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_q99_drift_broadcasts_counts_no_cartesian(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q99_embedding_drift"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q100_equidepth_no_single_partition_window(spark, sf_dir):
    """The whole point of the two-phase rank: no unpartitioned window over
    the data (the 60-row offset window is fine — it rides the broadcast)."""
    plan = plan_string(_df(spark, sf_dir, "q100_equidepth_histogram"))
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(coarse" in plan


def test_q101_generation_is_narrow_then_one_join(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q101_negative_sampling"))
    assert "CartesianProduct" not in plan
    # row-expanding map, not a join (formatted mode prints the Generate
    # node and its explode argument on separate lines)
    assert "Generate" in plan and "explode(" in plan


def test_q111_span_dedup_single_fact_shuffle(spark, sf_dir):
    """Window generation must stay narrow: exactly the content-keyed
    exchange (for the occurrence window) plus the doc rollup — no join,
    no cartesian."""
    plan = plan_string(_df(spark, sf_dir, "q111_span_dedup"))
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_q112_semdedup_pairs_are_cluster_equijoin(spark, sf_dir):
    """The SemDeDup pair stage must be an equi-join keyed on the cluster
    id — a cartesian (or broadcast-nested-loop over the full corpus)
    would be the O(n²) plan the operator exists to avoid."""
    plan = plan_string(_df(spark, sf_dir, "q112_semdedup"))
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoins allowed are the K-centroid
    # assignment cross-joins (constant-size build side), so any pair join
    # on cluster id must appear as a hash/sort-merge equi-join
    assert "c1" in plan and ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan)


def test_q113_source_overlap_broadcasts_pairs(spark, sf_dir):
    """The verified pair list (dup-density-sized) must broadcast into the
    doc→source projection — the fact table is never shuffled."""
    plan = plan_string(_df(spark, sf_dir, "q113_source_overlap"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q118_variable_folds_to_pushed_filter(spark, sf_dir):
    """The session variable must constant-fold so the quantity filter
    reaches the parquet scan like a hardcoded literal."""
    plan = plan_string(_df(spark, sf_dir, "q118_session_variables"))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity" in plan


def test_q116_lateral_decorrelates(spark, sf_dir):
    """The correlated LATERAL must decorrelate to a join + per-key rank —
    never a per-row re-execution or cartesian."""
    plan = plan_string(_df(spark, sf_dir, "q116_lateral_topk"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_q122_bigram_rarity_partial_agg_and_bottomk(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q122_bigram_rarity"))
    # corpus bigram frequencies must map-side combine before the shuffle
    assert "HashAggregate" in plan and ("partial_count" in plan or "Partial" in plan)
    # bottom-k is a per-partition partial top-k, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q123_normalize_is_codegen_no_python(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q123_text_normalize"))
    # the cleanup map must stay JVM-side (regexp_replace, no Arrow/Python)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # one scan, project, and map-side partial agg — no extra exchange
    assert "partial_count" in plan or "Partial" in plan
    assert plan.count("Exchange") <= 2  # tree + detail of the single shuffle


def test_q125_temperature_mix_broadcasts_total(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q125_temperature_mix"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q126_maxsim_broadcasts_queries_no_cartesian(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q126_maxsim_late_interaction"))
    # query side must broadcast; the pair stage is the Arrow-batched UDF
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan


def test_q133_triangles_no_cartesian_and_reuses_pairs(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q133_dup_graph_triangles"))
    assert "CartesianProduct" not in plan
    # the pair graph must come from the session memo, not three fresh
    # LSH pipelines: the persisted scan appears as InMemoryTableScan
    assert "InMemoryTableScan" in plan


def test_q136_containment_no_cartesian(spark, sf_dir):
    assert_not_in_plan(
        _df(spark, sf_dir, "q136_containment_dedup"), "CartesianProduct"
    )


def test_q137_cogroup_single_copartitioned_exchange(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q137_cogroup_reconcile"))
    assert "FlatMapCoGroupsInPandas" in plan
    # both inputs shuffle once on the key; no join node, no cartesian
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_q138_window_group_limit_rewrite_fires(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q138_window_group_limit"))
    # the map-side group limit must run BEFORE the exchange (partial
    # top-k per partition — the whole point of the rewrite)
    assert "WindowGroupLimit" in plan
    tree = plan.split("(1) Scan")[0]
    assert tree.index("WindowGroupLimit") > tree.index("Exchange") or \
        plan.count("WindowGroupLimit") >= 2


def test_q142_masking_broadcasts_policy_no_extra_shuffle(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q142_policy_masking"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # masking is a projection — no Python eval anywhere
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q150_hamming_broadcasts_queries_integer_only(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q150_hamming_topk"))
    # tiny query side broadcast; big side never shuffles before the top-k
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # signature + distance stay JVM-side (pure codegen, no Python)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q151_bitmap_rollup_reaggregates_partials(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q151_bitmap_distinct_rollup"))
    assert "bitmap_construct_agg" in plan
    assert "bitmap_or_agg" in plan
    # the total-distinct level must aggregate the BITMAP layer, never
    # rescan raw events with a count-distinct expand
    assert "Expand" not in plan


def test_q153_prefix_sum_windows_are_bucket_partitioned(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q153_systematic_weighted_sample"))
    # the corpus-sized window must be partitioned by bucket (parallel),
    # proving the running total never funnels the corpus into one task
    assert "hashpartitioning(bkt" in plan
    assert "CartesianProduct" not in plan


def test_q156_ohlc_is_two_phase_aggregate(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q156_ohlc_downsample"))
    # min_by/max_by must partial-aggregate BEFORE the exchange (the
    # struct ordering key forces SortAggregate, but the map-side combine
    # is what survives scale); never a Window over the raw events
    assert "partial_min_by" in plan and "partial_max_by" in plan
    assert "Window" not in plan


def test_q162_both_generations_prune_partitions(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q162_partition_evolution"))
    # both layout generations must show partition-level pruning on their
    # scans; the event_type IN filter reaches the new layout's directories
    assert plan.count("PartitionFilters: [") >= 1
    assert "event_type" in plan.split("PartitionFilters")[-1].splitlines()[0] or \
        plan.count("PartitionFilters: [") >= 2


def test_q171_topk_never_global_sorts(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q171_collocation_lift"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Single-partition gate (round-5): no query may force corpus-sized data
# through one task — unpartitioned Window nodes and SinglePartition
# exchanges are flagged by plans.explain.single_partition_findings, with
# post-limit and zero-key-agg shapes auto-allowed. scripts/plan_audit.py
# runs the same detector over the WHOLE registry (PLAN_AUDIT.md's
# GLOBAL_1PART column, with the documented bounded-frame allowlist);
# these tests pin the detector's semantics plus the queries most at risk.
# ---------------------------------------------------------------------------

def test_single_partition_detector_semantics(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from spark_state_provider_spark.plans.explain import (
        single_partition_findings,
    )

    df = spark.range(100).withColumn("k", F.col("id") % 5)
    # global ordered window → flagged
    bad = df.withColumn("r", F.row_number().over(W.orderBy("id")))
    assert any("global_window" in f for f in single_partition_findings(bad))
    # partitioned window → clean
    good = df.withColumn(
        "r", F.row_number().over(W.partitionBy("k").orderBy("id"))
    )
    assert single_partition_findings(good) == []
    # partition-only window (no orderBy; 2 bracket groups too) → clean
    part_only = df.withColumn("m", F.max("id").over(W.partitionBy("k")))
    assert single_partition_findings(part_only) == []
    # zero-key aggregate's SinglePartition exchange → allowed
    assert single_partition_findings(df.agg(F.count("*").alias("n"))) == []
    # global window over a post-limit frame (bounded) → allowed
    lim = df.orderBy("id").limit(5).withColumn(
        "r", F.row_number().over(W.orderBy("id"))
    )
    assert single_partition_findings(lim) == []


def test_q124_curriculum_no_corpus_global_window(spark, sf_dir):
    from spark_state_provider_spark.plans.explain import (
        single_partition_findings,
    )

    df = _df(spark, sf_dir, "q124_curriculum_order")
    plan = plan_string(df)
    # the corpus-sized rank window must be coarse-bucket-partitioned
    assert "hashpartitioning(coarse" in plan
    # the only global window left is the prefix sum over the ~150-row
    # coarse-bucket counts frame (the documented bucket-offset pattern)
    finds = single_partition_findings(df)
    assert all("sum(cn" in f or "Sort [coarse" in f for f in finds), finds


@pytest.mark.parametrize(
    "name",
    [
        "q12_window_rank", "q38_sequence_packing", "q94_rolling_anomaly",
        "q107_trend_slope", "q111_span_dedup", "q116_lateral_topk",
        "q119_bpe_merge_candidates", "q125_temperature_mix",
        "q49_bm25", "q70_grouped_topk_array",
    ],
)
def test_no_unallowlisted_single_partition(spark, sf_dir, name):
    from spark_state_provider_spark.plans.explain import (
        single_partition_findings,
    )

    assert single_partition_findings(_df(spark, sf_dir, name)) == []


def test_q221_two_corpus_passes_broadcast_scores_topk(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q221_dsir_importance"))
    # the feature table broadcasts back onto the per-doc bucket rows and
    # the global top-k never full-sorts
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # DSIR's production cost is exactly two corpus passes — a third scan
    # (the regression this pin guards: a second aggregate branch that
    # replays the bucket-count lineage) must never come back
    import re as _re

    n_scans = len(_re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 2, n_scans
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q222_single_pass_no_joins_partial_agg(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q222_gopher_rules"))
    # the whole battery is one map pass + one combinable aggregate
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "partial_" in plan
    import re as _re

    n_scans = len(_re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, n_scans
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q223_label_partitioned_window_broadcast_median(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q223_embedding_norm_qa"))
    # the order-statistic window must be label-partitioned (parallel),
    # and the |labels|-row median table must broadcast back
    assert "hashpartitioning(label" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q224_candidates_broadcast_never_cartesian(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "q224_minhash_calibration"))
    # the scalar candidate table broadcasts onto the signature frame
    # (twice); the pair stage must never widen into a cartesian product
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
