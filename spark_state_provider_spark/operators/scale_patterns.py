"""Scale-pattern operators: skew-salted aggregation (oracle-checked) and
bucketed co-located joins.

``events.event_type`` has exactly 5 values — a genuinely skewed grouping
key (every row lands on 5 reducers no matter how many there are). The
salted two-phase plan is the 100 TB answer and, being deterministic, equals
the plain aggregate — so the oracle checks it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_state_provider_spark.functions.skew import salted_sum_count
from spark_state_provider_spark.operators.registry import register
from spark_state_provider_spark.tables import load_table


@register(
    "q32_salted_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q32_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase aggregation over the 5-value event_type key.

    Phase 1 shuffles on (event_type, salt16) so each hot key spreads over 16
    reducers; phase 2 merges 5×16 partial rows. Output is identical to the
    naive groupBy — verified by the oracle — while the shuffle profile is
    flat at any scale.
    """
    e = load_table(spark, sf_dir, "events")
    out = salted_sum_count(
        e,
        key="event_type",
        agg_exprs={
            "n_events": "COUNT(*)",
            # exact decimal partials; final re-sum stays exact
            "sum_value": "SUM(CAST(value AS DECIMAL(18,2)))",
        },
        salt_from="event_id",
        buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Q36 — deterministic stratified sampling: fixed-size per-stratum samples
# chosen by hash order, the balanced-training-mix op of an LLM data pipeline.
# Hash-ordered row_number (not rand()/sampleBy) keeps the sample reproducible
# across engines, runs, AND cluster sizes — re-running the pipeline on the
# same corpus always selects the same documents.
# ---------------------------------------------------------------------------

SAMPLE_PER_STRATUM = 20


@register(
    "q36_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, rn
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
)
def q36_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{SAMPLE_PER_STRATUM} docs per language, selected by md5(doc_id) order.

    One shuffle on the stratum key; the per-partition window computes a
    per-stratum top-k. Skew note: a dominant language concentrates its
    stratum in one task — at scale, pre-aggregate with a per-partition
    partial top-k (the same pattern as q14's TakeOrderedAndProject) or salt
    the stratum and re-rank the k·buckets survivors.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SAMPLE_PER_STRATUM)
    )


# ---------------------------------------------------------------------------
# q68 — bucketed co-located join as a contract query (the plan property is
# separately pinned by tests/test_scale_patterns.py): both fact tables are
# written bucketed+sorted on the join key, so the repeated join runs with
# no Exchange on either side — the layout decision that turns a 100 TB
# hourly join from shuffle-bound to scan-bound.
# ---------------------------------------------------------------------------



# warehouse fixture tables follow the scratch-dir convention
# (``ssps_*_<pid>``): pid-scoped names mean concurrent processes (bench +
# pytest + replica) can never clobber each other's table files mid-read
# (measured: a concurrent replica's rmtree+rewrite failed two pytest
# oracle checks with FILE_NOT_EXIST), and a once-per-process sweep
# removes dirs whose owning pid is dead so the warehouse stays bounded.
_WH_SWEPT = False


def _warehouse_pid_dir(spark) -> str:
    from urllib.parse import urlparse

    return urlparse(spark.conf.get("spark.sql.warehouse.dir")).path


def _sweep_warehouse(spark) -> None:
    global _WH_SWEPT
    if _WH_SWEPT:
        return
    _WH_SWEPT = True
    import shutil

    from spark_state_provider_spark.scratch import _PID_RE, _pid_alive

    wh = _warehouse_pid_dir(spark)
    try:
        entries = os.listdir(wh)
    except OSError:
        return
    for name in entries:
        m = _PID_RE.match(name)
        if not m:
            continue
        pid = int(m.group(1))
        if pid == os.getpid() or _pid_alive(pid):
            continue
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)


@register(
    "q68_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q68_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two pre-bucketed tables (8 buckets on the order key) and
    aggregate — the exchange-free repeated-join pattern, surfaced in the
    driver contract. Tables are (re)written once per session/sf."""
    # Pid-scoped names (ssps_*_<pid>, the scratch convention): stable
    # WITHIN a process (one copy per query per sf), never shared ACROSS
    # processes (a concurrent run rewriting a shared name yanks files
    # out from under this process's lazy scans); dead-pid copies are
    # swept once per process.
    _sweep_warehouse(spark)
    from spark_state_provider_spark.scratch import corpus_tag

    tag = corpus_tag(sf_dir) + f"_{os.getpid()}"
    to_name, tl_name = f"ssps_q68_orders_{tag}", f"ssps_q68_lineitem_{tag}"

    def build(name: str, table: str, key: str) -> None:
        if spark.catalog.tableExists(name):
            return  # this session already built it for this sf
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil

        wh = _warehouse_pid_dir(spark)
        shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)
        (
            load_table(spark, sf_dir, table)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )

    build(to_name, "orders", "o_orderkey")
    build(tl_name, "lineitem", "l_orderkey")
    o = spark.table(to_name)
    li = spark.table(tl_name)
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").alias(
                "sum_qty"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q75 — heavy-hitter detection: the hot-key detector that FEEDS the q32
# salting decision. At 100 TB you cannot groupBy the full key space just to
# learn which keys are hot; the scale answer is a bounded-memory sketch per
# partition (Misra-Gries summary: k counters, uniform-decrement on
# overflow) whose union provably contains every key above the frequency
# threshold, followed by an EXACT recount of only that candidate set. The
# final output is therefore exactly equal to the naive full groupBy — the
# sketch only bounds the candidate-generation memory, never the answer.
# ---------------------------------------------------------------------------

_HH_K = 1500  # report keys with count > total/_HH_K
_MG_COUNTERS = 4096  # per-partition MG counters; must be >= _HH_K for the
# retention guarantee (MG undercount <= n_p/(counters+1) < n_p/_HH_K)


def _mg_candidates(batches):
    """Per-partition Misra-Gries summary over l_partkey (pandas batches).

    Batch variant: merge each Arrow batch's value_counts into the running
    counter Series; when counters exceed the budget, subtract the
    (k+1)-largest count from everything and drop non-positives. Total
    subtracted mass per element <= n_p/(k+1), so any key with partition
    count above that survives — the classic MG guarantee.
    """
    import pandas as pd

    s = None
    for pdf in batches:
        vc = pdf["l_partkey"].value_counts()
        s = vc if s is None else s.add(vc, fill_value=0)
        if len(s) > _MG_COUNTERS:
            cut = s.nlargest(_MG_COUNTERS + 1).iloc[-1]
            s = s[s > cut] - cut
    if s is None or len(s) == 0:
        yield pd.DataFrame({"l_partkey": pd.Series([], dtype="int64")})
    else:
        yield pd.DataFrame({"l_partkey": s.index.astype("int64")})


@register(
    "q75_heavy_hitters",
    oracle=f"""
    WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem)
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM lineitem, tot
    GROUP BY l_partkey, tot.n
    HAVING count(*) * {_HH_K} > tot.n
    """,
)
def q75_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (keys with > 1/{_HH_K} of all lineitem rows)
    via per-partition Misra-Gries candidates + exact recount.

    Scale shape: candidate generation is one narrow Arrow-batched pass
    with O(counters) memory per partition and emits at most `counters`
    keys per partition — no shuffle of the full key space. The recount
    semi-joins the (tiny, broadcast) candidate set into the scan and
    aggregates only surviving rows; the total-row threshold rides a
    one-row broadcast. The oracle is the NAIVE full groupBy — the results
    are exactly equal; only the memory/shuffle profile differs.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    total = li.agg(F.count("*").alias("n"))
    cand = li.mapInPandas(_mg_candidates, schema="l_partkey long").distinct()
    return (
        li.join(F.broadcast(cand), "l_partkey", "left_semi")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_occurrences"))
        .join(F.broadcast(total), F.col("n_occurrences") * _HH_K > F.col("n"))
        .select("l_partkey", "n_occurrences")
    )


# ---------------------------------------------------------------------------
# q76 — dynamic partition pruning: the partition-layout twin of q68's
# bucketing. A fact table partitioned on a join key is only half the win —
# the other half is the runtime skipping Spark injects when the dim side's
# filter arrives only at execution time (DPP: the broadcast dim's key set
# becomes a partition filter on the fact scan). At 100 TB this is the
# difference between scanning 5/5 and 2/5 of the table.
# ---------------------------------------------------------------------------

_EVENT_CATEGORIES = [
    ("view", "traffic"),
    ("click", "conversion"),
    ("purchase", "conversion"),
    ("signup", "growth"),
    ("error", "ops"),
]


@register(
    "q76_dynamic_partition_pruning",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    JOIN (VALUES ('view','traffic'), ('click','conversion'),
                 ('purchase','conversion'), ('signup','growth'),
                 ('error','ops')) AS dim(event_type, category)
      USING (event_type)
    WHERE category = 'conversion'
    GROUP BY event_type
    """,
)
def q76_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over an event_type-partitioned copy of events, joined to
    a category dim filtered at runtime — Spark injects a dynamic partition
    filter (reusing the dim broadcast) so only the matching partition
    directories are scanned.

    The partitioned copy is written once per process/sf (q68's
    deterministic-name + stale-location-clear pattern). The plan gate
    asserts ``dynamicpruningexpression`` on the fact scan — without DPP
    this query silently degrades to a full scan, which is exactly the
    regression the test exists to catch.
    """
    _sweep_warehouse(spark)
    from spark_state_provider_spark.scratch import corpus_tag

    tag = corpus_tag(sf_dir) + f"_{os.getpid()}"
    name = f"ssps_q76_events_{tag}"
    if not spark.catalog.tableExists(name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil

        wh = _warehouse_pid_dir(spark)
        shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)
        (
            load_table(spark, sf_dir, "events")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .saveAsTable(name)
        )
    ev = spark.table(name)
    dim = spark.createDataFrame(
        _EVENT_CATEGORIES, "event_type string, category string"
    )
    return (
        ev.join(F.broadcast(dim), "event_type")
        .where(F.col("category") == "conversion")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# q79 — salted skew JOIN: the join-side twin of q32's salted aggregation.
# events.user_id has only 150 distinct values — a plain shuffle join can
# use at most 150 reducers no matter the cluster size, and one hot user
# serializes its whole partition. The salt spreads each key over
# _JOIN_SALTS reducers (big side: row-hash salt; small side: replicated
# across all salts), trading an S× dim replication — cheap, it's the
# small side — for S× join parallelism on hot keys. Salting is
# correctness-neutral, so the oracle is the PLAIN join.
# ---------------------------------------------------------------------------

_JOIN_SALTS = 8


@register(
    "q79_salted_join",
    oracle="""
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           max(c.c_mktsegment) AS segment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id
    """,
)
def q79_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events⋈customer on a 150-key join column, salted 8 ways.

    Big side: salt = pmod(xxhash64(event_id), S) — deterministic,
    row-dependent, so a hot user's rows spread over S reducers. Small
    side: each customer row replicated for all S salts (explode of a
    literal sequence — at 100 TB this is the side you replicate BECAUSE
    it is small). Join on (key, salt); the follow-on per-user aggregate
    partial-aggregates map-side so the second shuffle carries ≤150×S
    rows. Result provably equals the unsalted join (oracle is the plain
    form). For automatic handling of residual skew this composes with AQE
    skew-join splitting, which only acts on post-shuffle partition sizes.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.pmod(F.xxhash64("event_id"), F.lit(_JOIN_SALTS)).alias("salt"),
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_JOIN_SALTS - 1)))
        )
    )
    # At test scale the replicated dim would still broadcast (which makes
    # salting inert — broadcast joins have no reducer to skew); the hint
    # pins the shuffled-hash shape the pattern exists for, i.e. a dim
    # above the broadcast threshold.
    return (
        ev.join(
            cust.hint("shuffle_hash"),
            (ev.user_id == cust.c_custkey)
            & (ev.salt == cust.salt.cast("long")),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_value"),
            F.max("c_mktsegment").alias("segment"),
        )
    )


# ---------------------------------------------------------------------------
# q93 — runtime bloom-filter join pruning: the ROW-level twin of q76's
# PARTITION-level pruning. When the selective filter sits on the dim side
# of a shuffle join, partition layout can't help the fact side; Spark's
# runtime row-level filtering builds a bloom filter over the filtered
# dim's join keys during execution and injects a `might_contain` predicate
# into the fact scan, dropping non-joining rows BEFORE they are shuffled.
# At 100 TB this converts a full-fact shuffle into a shuffle of only the
# ~matching rows — the single biggest lever on selective fact-dim joins
# that are too big to broadcast.
# ---------------------------------------------------------------------------


def _bloom_join_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join, planned while runtime bloom filtering is forced on."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.expr(
                "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_qty"),
        )
    )


@register(
    "q93_runtime_bloom_join",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def q93_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim shuffle join with runtime bloom-filter row pruning.

    The confs force the shape the pattern exists for (a dim above the
    broadcast threshold; the application-side size gate dropped so the
    injection fires at test scale) and the physical plan is materialized
    eagerly inside the conf scope — `executedPlan` is cached on the
    returned DataFrame's QueryExecution, so the bloom-filtered plan is the
    one that runs even after the confs are restored. Bloom injection is
    semantics-neutral (a false-positive row still dies in the join), so
    the oracle is the PLAIN join; the plan gate in tests/test_plans.py
    asserts `might_contain` + `bloom_filter_agg` actually appear.
    """
    restore = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": None,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.autoBroadcastJoinThreshold": None,
    }
    for k in restore:
        try:
            restore[k] = spark.conf.get(k)
        except Exception:
            restore[k] = None
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out = _bloom_join_plan(spark, sf_dir)
        # force physical planning NOW, inside the conf scope
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in restore.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# q98 — join-size estimation from key histograms: the planning op behind
# every salting/broadcast decision in this module (q32/q75/q79). The size
# of a key-equijoin is EXACTLY Σ_k c_a(k)·c_b(k) over per-key counts, so
# a 100 TB self-join's row count is known from one partial-aggregated
# scan (|keys| histogram rows — here 150) without shuffling a single
# joined row. The query computes the estimate AND executes the join to
# count it, returning both plus their (always-true, because the formula
# is an identity) agreement — the same verdict pattern as the q10 sketch
# queries, giving the estimator a hard hash check.
# ---------------------------------------------------------------------------


@register(
    "q98_join_size_estimate",
    oracle="""
    WITH h AS (
        SELECT CAST(sum(n * n) AS BIGINT) AS est
        FROM (SELECT count(*) AS n FROM events GROUP BY user_id)
    ), j AS (
        SELECT CAST(count(*) AS BIGINT) AS actual
        FROM events a JOIN events b ON a.user_id = b.user_id
    )
    SELECT est AS est_rows, actual AS actual_rows, est = actual AS matches
    FROM h, j
    """,
)
def q98_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted vs executed size of the events-on-user_id self-join.

    The estimate side is the scale path: one scan, map-side-combined
    per-key counts, a 150-row sum of squares — no join. The executed
    side exists only to certify the identity; in production you'd run
    the histogram alone and pick broadcast/salt/bucket strategy from
    `est_rows` (and the per-key maxima it's built from).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    hist = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    est = hist.agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("est_rows"))
    b = ev.select(F.col("user_id").alias("buid"))
    actual = (
        ev.join(b, ev.user_id == b.buid)
        .agg(F.count("*").cast("long").alias("actual_rows"))
    )
    return (
        est.join(actual)
        .select(
            "est_rows",
            "actual_rows",
            (F.col("est_rows") == F.col("actual_rows")).alias("matches"),
        )
    )


# ---------------------------------------------------------------------------
# q102 — AQE skew-join splitting: the RUNTIME complement to q79's manual
# salting. Salting pre-plans for skew you know about; AQE's
# OptimizeSkewedJoin handles the skew you discover at execution time — it
# reads the map-output statistics of the shuffle, finds reduce partitions
# over factor×median, and splits them across multiple tasks (replicating
# the matching dim rows), with NO query rewrite. The fact side carries a
# deliberately skewed derived key (~90% of rows hash to one key — the
# md5-prefix rule, so DuckDB replays it exactly); the contract result is
# the plain join aggregate, and the split decision is captured from the
# executed plan for the plan gate. Findings that generalize to 100 TB:
# skew stats are COMPRESSED map-output bytes (a skewed-but-compressible
# key can hide under the threshold), and a reduce partition written by a
# single map task cannot be split at all (split boundaries are mapper
# chunks) — both measured here, both worth knowing before relying on AQE
# in production.
# ---------------------------------------------------------------------------

_SKEW_DIM = 1500  # covers every user_id (0..1499)

# executed-plan capture for the plan gate (AQE decisions exist only after
# execution, and the aggressive tuning confs are restored on exit)
LAST_Q102_PLAN = ""

_Q102_KEY_SQL = (
    "CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT"
    " % 10 < 9 THEN 0 ELSE user_id END"
)


@register(
    "q102_aqe_skew_join",
    oracle=f"""
    WITH f AS (
        SELECT {_Q102_KEY_SQL} AS k, props FROM events
    ),
    dim AS (SELECT range AS dk, range % 7 AS grp FROM range(0, {_SKEW_DIM}))
    SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(length(props)) AS BIGINT) AS sum_plen
    FROM f JOIN dim ON f.k = dim.dk
    GROUP BY grp
    """,
)
def q102_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact-dim shuffle join executed under AQE skew splitting;
    returns the per-group aggregate (equal to the plain join — splitting
    is semantics-neutral).

    The join EXECUTES inside the conf scope (collect on the 7-row
    aggregate — a `.write` would execute a separate QueryExecution and
    leave the adaptive plan unfinalized) because OptimizeSkewedJoin acts
    at runtime; the final adaptive plan is kept in ``LAST_Q102_PLAN`` for
    the plan gate. The fact is pre-repartitioned so the shuffle has
    multiple map tasks — a single-mapper reduce partition has one chunk
    and cannot be split (measured: the one-file testdata scan produced
    zero skew splits until this was added; real 100 TB inputs always
    have many splits).
    """
    global LAST_Q102_PLAN
    restore: dict[str, str | None] = {}
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        # thresholds sized for the COMPRESSED hot partition at the tiny
        # test scales (map-output statistics are compressed bytes; at
        # production scale the defaults 5x/256MB are the right knobs)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    for k in confs:
        try:
            restore[k] = spark.conf.get(k)
        except Exception:
            restore[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        key = (
            F.when(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 12
                    ),
                    16,
                    10,
                ).cast("long")
                % 10
                < 9,
                F.lit(0),
            )
            .otherwise(F.col("user_id"))
            .alias("k")
        )
        fact = (
            load_table(spark, sf_dir, "events")
            .repartition(spark.sparkContext.defaultParallelism)
            .select(key, "props")
        )
        dim = spark.range(0, _SKEW_DIM).select(
            F.col("id").alias("dk"), (F.col("id") % 7).alias("grp")
        )
        joined = (
            fact.join(dim, fact.k == dim.dk)
            .groupBy("grp")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.length("props")).alias("sum_plen"),
            )
        )
        rows = joined.collect()
        LAST_Q102_PLAN = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        for k, v in restore.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        rows, "grp bigint, n bigint, sum_plen bigint"
    )


# ---------------------------------------------------------------------------
# q109 — NULL-skew outer join: the skew class q32/q79/q102 don't cover.
# In an outer join, NULL-keyed rows can never match but still flow
# through the join operator — and every one of them hashes to the SAME
# reducer, so a fact table where most join keys are missing (unresolved
# user ids, anonymous sessions — the normal case in clickstream data)
# serializes on one task. AQE skew splitting can subdivide that partition,
# but the rows still pay the shuffle + join machinery for keys that
# provably cannot match. The split plan is structural: null-keyed rows
# BYPASS the join entirely (null-extended by construction) and union with
# the not-null side's join — zero shuffled null rows, provably equal
# results. The oracle is the PLAIN left join.
# ---------------------------------------------------------------------------

_NULLSKEW_MOD = 10  # ~90% of fact keys become NULL


@register(
    "q109_null_skew_outer_join",
    oracle=f"""
    WITH f AS (
        SELECT event_id,
               CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
                         % {_NULLSKEW_MOD} < {_NULLSKEW_MOD - 1}
                    THEN NULL ELSE user_id END AS k,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unmatched,
           CAST(sum(v) AS DOUBLE) AS sum_value,
           CAST(sum(CASE WHEN c.c_custkey IS NOT NULL THEN v END) AS DOUBLE)
               AS matched_value
    FROM f LEFT JOIN customer c ON f.k = c.c_custkey
    """,
)
def q109_null_skew_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer enrichment where ~90% of fact keys are NULL, executed
    with the null-split plan: NULL-keyed rows never enter the join.

    Scale shape: the not-null slice joins normally (here it would even
    broadcast; at 100 TB it shuffles only the ~10% resolvable rows); the
    NULL slice is a pure narrow pass-through with null-extended dim
    columns. No reducer ever receives the NULL hotspot. The aggregate
    proves equality with the naive plan (the oracle IS the naive join).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 12),
                16,
                10,
            ).cast("long")
            % _NULLSKEW_MOD
            < _NULLSKEW_MOD - 1,
            F.lit(None).cast("long"),
        )
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck")
    )
    notnull = (
        ev.where(F.col("k").isNotNull())
        .join(cust, F.col("k") == F.col("ck"), "left")
        .select("event_id", "k", "v", "ck")
    )
    nulls = ev.where(F.col("k").isNull()).select(
        "event_id", "k", "v", F.lit(None).cast("long").alias("ck")
    )
    j = notnull.unionByName(nulls)
    return j.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("ck").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unmatched"),
        F.sum("v").cast("double").alias("sum_value"),
        F.sum(F.when(F.col("ck").isNotNull(), F.col("v")))
        .cast("double")
        .alias("matched_value"),
    )


# ---------------------------------------------------------------------------
# q151 — exact-distinct rollup via mergeable bitmaps.
#
# COUNT(DISTINCT) does not re-aggregate: daily distinct-user counts cannot
# be summed into a monthly distinct. The scale answer is to materialize the
# aggregate as a MERGEABLE partial — a roaring-style bitmap per
# (group, bucket) — so higher rollup levels are pure bitmap ORs of the
# lower level, never a re-scan of the raw fact table. That is how a 100 TB
# events table serves "distinct users per day AND per type" from one scan:
# the daily bitmaps are the cube's base layer; every coarser cell is
# bitmap_or_agg over already-tiny partials. Spark 3.5+ ships the whole
# toolkit natively (bitmap_bucket_number / bitmap_bit_position /
# bitmap_construct_agg / bitmap_or_agg / bitmap_count) — JVM-side,
# partial-aggregatable, no UDF.
#
# The oracle recomputes both levels with plain COUNT(DISTINCT), proving
# the bitmap path exact (not approximate like HLL in q10d/q144).
# ---------------------------------------------------------------------------


@register(
    "q151_bitmap_distinct_rollup",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(DISTINCT user_id) AS day_distinct
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
        FROM events GROUP BY 1
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(d.day_distinct) AS BIGINT) AS sum_daily_distinct,
           any_value(t.distinct_users) AS distinct_users
    FROM daily d JOIN tot t ON d.event_type = t.event_type
    GROUP BY d.event_type
    """,
)
def q151_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type at two grains — per-day (summed) and
    exact total — where the total is MERGED from the daily bitmaps, not
    recomputed from the raw rows.

    One shuffle builds the (event_type, day, bucket) bitmap layer; the
    event_type total is a second aggregation over those partials whose
    input is already thousands-fold smaller than the fact table. The
    re-aggregation property (or-merge, exact) is what COUNT(DISTINCT)
    lacks and what HLL (q10d/q144) only approximates.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    daily_bm = e.groupBy("event_type", "day", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    day_cnt = daily_bm.groupBy("event_type", "day").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("day_distinct")
    )
    ev_cnt = (
        daily_bm.groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm_all"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm_all)")).cast("long").alias("distinct_users")
        )
    )
    per_type = day_cnt.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("day_distinct").cast("long").alias("sum_daily_distinct"),
    )
    return per_type.join(ev_cnt, "event_type")


# ---------------------------------------------------------------------------
# q183 — Count-Min sketch, the one classical mergeable sketch not yet in
# the inventory (HLL q10d/q144, Greenwald-Khanna q10e, frequent-items
# q10f, Misra-Gries q75, bitmap q151, bloom q93). CMS answers point
# frequency queries from d×w integer cells: cell(j, h_j(x)) += 1 on
# ingest, estimate(x) = min_j cell(j, h_j(x)) — one-sided error
# (NEVER underestimates), cells merge by plain addition (the
# re-aggregation property), and with FIXED hash parameters the sketch is
# a pure function of the data, so the DuckDB oracle rebuilds it
# bit-for-bit. Scale: the sketch build is one exploded groupBy (d rows
# per input row, map-side combinable into d·w cells — constant size), and
# point queries touch d cells; this is how a 100 TB stream serves
# "how often did key x occur" from kilobytes of state.
# ---------------------------------------------------------------------------

_CMS_P = 2_147_483_647  # Mersenne prime 2^31−1
_CMS_W = 256
_CMS_ROWS = ((3, 17), (5, 101), (7, 907), (11, 4099))  # (a_j, b_j)
_CMS_TOP = 20


def _cms_hash_sql(j: int, x: str) -> str:
    a, b = _CMS_ROWS[j]
    return f"(({a} * ({x} % {_CMS_P}) + {b}) % {_CMS_P}) % {_CMS_W}"


def _cms_oracle() -> str:
    cell_legs = " UNION ALL ".join(
        f"SELECT {j} AS rw, {_cms_hash_sql(j, 'user_id')} AS bkt FROM events"
        for j in range(len(_CMS_ROWS))
    )
    est_legs = " , ".join(
        f"(SELECT c FROM cells WHERE rw = {j}"
        f" AND bkt = {_cms_hash_sql(j, 't.user_id')})"
        for j in range(len(_CMS_ROWS))
    )
    return f"""
    WITH cells AS (
        SELECT rw, bkt, CAST(count(*) AS BIGINT) AS c
        FROM ({cell_legs}) GROUP BY rw, bkt
    ),
    exact AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
        FROM events GROUP BY user_id
        ORDER BY exact_n DESC, user_id LIMIT {_CMS_TOP}
    )
    SELECT t.user_id, t.exact_n,
           CAST(least({est_legs}) AS BIGINT) AS cms_n,
           least({est_legs}) >= t.exact_n AS never_underestimates
    FROM exact t
    """


@register("q183_count_min_sketch", oracle=_cms_oracle())
def q183_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point-frequency estimates for the {_CMS_TOP} hottest users,
    next to their exact counts and the one-sided-error verdict.

    The sketch is {len(_CMS_ROWS)}×{_CMS_W} BIGINT cells built in one
    combinable aggregate; the probe side joins each queried key to its
    d cells (broadcast — the sketch is kilobytes at ANY corpus size)
    and takes the min. Hash params are fixed literals, so estimates are
    engine-exact.
    """
    e = load_table(spark, sf_dir, "events").select("user_id")
    legs = [
        e.select(
            F.lit(j).alias("rw"),
            F.expr(_cms_hash_sql(j, "user_id")).alias("bkt"),
        )
        for j in range(len(_CMS_ROWS))
    ]
    exploded = legs[0]
    for leg in legs[1:]:
        exploded = exploded.unionByName(leg)
    cells = exploded.groupBy("rw", "bkt").agg(F.count("*").alias("c"))

    exact = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(_CMS_TOP)
    )
    probes = exact
    for j in range(len(_CMS_ROWS)):
        cj = cells.where(F.col("rw") == j).select(
            F.col("bkt").alias(f"bkt{j}"), F.col("c").alias(f"c{j}")
        )
        probes = probes.join(
            F.broadcast(cj),
            F.expr(_cms_hash_sql(j, "user_id")) == F.col(f"bkt{j}"),
        )
    est = F.least(*[F.col(f"c{j}") for j in range(len(_CMS_ROWS))])
    return probes.select(
        "user_id",
        "exact_n",
        est.cast("long").alias("cms_n"),
        (est >= F.col("exact_n")).alias("never_underestimates"),
    )


# ---------------------------------------------------------------------------
# q185 — EXPLICIT Bloom filter with measured false-positive rate. q93
# exercises the optimizer-injected bloom join; this is the filter as a
# first-class data structure: m bits in ⌈m/32⌉ integer words built by a
# combinable OR-aggregate, fixed portable hashes so Spark and DuckDB set
# identical bits, then a probe pass measuring (a) zero false negatives —
# the Bloom guarantee — and (b) the exact false-positive count among
# known non-members. At 100 TB the words are the shuffle-free broadcast
# pre-filter for any anti-join-shaped "have we seen this key" question.
# 32-bit words keep the 1<<pos shifts overflow-free in a signed BIGINT.
# ---------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_WORDS = _BLOOM_M // 32
_BLOOM_HASHES = ((3, 17), (5, 101), (7, 907))  # (a, b) over the Mersenne p
_BLOOM_MEMBER_MOD = 2  # members: even custkeys; probes: odd custkeys


def _bloom_bit_sql(j: int, x: str) -> str:
    a, b = _BLOOM_HASHES[j]
    return f"(({a} * ({x} % {_CMS_P}) + {b}) % {_CMS_P}) % {_BLOOM_M}"


def _bloom_oracle() -> str:
    word_legs = " UNION ALL ".join(
        f"SELECT {_bloom_bit_sql(j, 'c_custkey')} // 32 AS w, "
        f"CAST(1 AS BIGINT) << ({_bloom_bit_sql(j, 'c_custkey')} % 32) AS bit "
        f"FROM customer WHERE c_custkey % {_BLOOM_MEMBER_MOD} = 0"
        for j in range(len(_BLOOM_HASHES))
    )
    probe_hits = " AND ".join(
        f"(SELECT bits FROM words WHERE w = {_bloom_bit_sql(j, 'p.c_custkey')} // 32)"
        f" & (CAST(1 AS BIGINT) << ({_bloom_bit_sql(j, 'p.c_custkey')} % 32)) <> 0"
        for j in range(len(_BLOOM_HASHES))
    )
    return f"""
    WITH words AS (
        SELECT w, CAST(bit_or(bit) AS BIGINT) AS bits
        FROM ({word_legs}) GROUP BY w
    ),
    probes AS (
        SELECT c_custkey, c_custkey % {_BLOOM_MEMBER_MOD} = 0 AS is_member,
               ({probe_hits}) AS bloom_hit
        FROM customer p
    )
    SELECT is_member,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(count(*) FILTER (WHERE bloom_hit) AS BIGINT) AS n_hits,
           CAST(count(*) FILTER (WHERE bloom_hit AND NOT is_member)
                AS BIGINT) AS n_false_positives
    FROM probes GROUP BY is_member
    """


@register("q185_bloom_filter_explicit", oracle=_bloom_oracle())
def q185_bloom_filter_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a {_BLOOM_M}-bit Bloom filter over the even customer keys,
    probe it with ALL keys, and report per-membership-class hit counts —
    members must hit 100% (no false negatives); the odd-key row carries
    the exact measured false-positive count.

    The filter is {_BLOOM_WORDS} integer words from one OR-combinable
    aggregate; the probe side broadcasts them (kilobytes at any corpus
    size) and tests k bits per key in pure codegen.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    members = cust.where(F.col("c_custkey") % _BLOOM_MEMBER_MOD == 0)
    legs = [
        members.select(
            F.expr(f"{_bloom_bit_sql(j, 'c_custkey')} div 32").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"{_bloom_bit_sql(j, 'c_custkey')} % 32)"
            ).alias("bit"),
        )
        for j in range(len(_BLOOM_HASHES))
    ]
    bits = legs[0]
    for leg in legs[1:]:
        bits = bits.unionByName(leg)
    words = bits.groupBy("w").agg(F.expr("bit_or(bit)").alias("bits"))

    probes = cust.select(
        "c_custkey",
        (F.col("c_custkey") % _BLOOM_MEMBER_MOD == 0).alias("is_member"),
    )
    hit = F.lit(True)
    for j in range(len(_BLOOM_HASHES)):
        wj = words.select(
            F.col("w").alias(f"w{j}"), F.col("bits").alias(f"bits{j}")
        )
        probes = probes.join(
            F.broadcast(wj),
            F.expr(f"{_bloom_bit_sql(j, 'c_custkey')} div 32") == F.col(f"w{j}"),
            "left",
        )
        hit = hit & (
            F.coalesce(
                F.col(f"bits{j}").bitwiseAND(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), "
                        f"{_bloom_bit_sql(j, 'c_custkey')} % 32)"
                    )
                ),
                F.lit(0),
            )
            != 0
        )
    return probes.withColumn("bloom_hit", hit).groupBy("is_member").agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_hits"),
        F.sum(
            F.when(F.col("bloom_hit") & ~F.col("is_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_positives"),
    )
