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
    # Deterministic names, rebuilt per process: the warehouse DIRECTORY
    # outlives the in-memory catalog, so a fresh process must clear the
    # stale location (DROP alone is a no-op when the catalog is empty)
    # before saveAsTable — and reusing one name means repeated runs no
    # longer accumulate table copies in spark-warehouse.
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    to_name, tl_name = f"ssps_q68_orders_{tag}", f"ssps_q68_lineitem_{tag}"

    def build(name: str, table: str, key: str) -> None:
        if spark.catalog.tableExists(name):
            return  # this session already built it for this sf
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
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
