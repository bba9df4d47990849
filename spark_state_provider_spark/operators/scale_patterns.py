"""Scale-pattern operators: skew-salted aggregation (oracle-checked) and
bucketed co-located joins.

``events.event_type`` has exactly 5 values — a genuinely skewed grouping
key (every row lands on 5 reducers no matter how many there are). The
salted two-phase plan is the 100 TB answer and, being deterministic, equals
the plain aggregate — so the oracle checks it.
"""

from __future__ import annotations

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
