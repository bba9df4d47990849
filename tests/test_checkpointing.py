"""The iterative operators' lineage-truncation switch: localCheckpoint by
default, reliable checkpoint() under spark.ssps.reliableCheckpoint — the
cluster-scale path that survives executor loss (VERDICT r2 item 4)."""

import pyspark.sql.functions as F
import pytest

from spark_state_provider_spark.checkpointing import reliable_enabled, truncate


def _lineage_cut(df) -> bool:
    """A (local)checkpointed DataFrame's optimized plan collapses to a
    LogicalRDD scan — the original operator tree is gone."""
    return "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture()
def reliable_conf(spark):
    spark.conf.set("spark.ssps.reliableCheckpoint", "true")
    yield spark
    spark.conf.set("spark.ssps.reliableCheckpoint", "false")


def test_truncate_local_default(spark):
    spark.conf.set("spark.ssps.reliableCheckpoint", "false")
    assert not reliable_enabled(spark)
    df = truncate(spark.range(10).withColumn("x", F.col("id") * 2))
    assert df.count() == 10
    assert _lineage_cut(df)


def test_truncate_reliable_sets_dir_and_checkpoints(reliable_conf):
    spark = reliable_conf
    assert reliable_enabled(spark)
    df = truncate(spark.range(10).withColumn("x", F.col("id") * 2))
    assert df.count() == 10
    assert _lineage_cut(df)
    assert spark.sparkContext.getCheckpointDir() is not None


def test_lazy_truncate_materializes_under_count(spark):
    spark.conf.set("spark.ssps.reliableCheckpoint", "false")
    df = truncate(spark.range(7), eager=False)
    assert df.count() == 7  # the count IS the materializing action
    assert _lineage_cut(df)


def test_bfs_identical_under_reliable_checkpoint(reliable_conf, sf_dir):
    from spark_state_provider_spark import operators
    from spark_state_provider_spark.operators import registry

    operators.load_all()
    spark = reliable_conf
    fn = registry.get("q110_bfs_distances").fn
    reliable = {(r["id"], r["dist"]) for r in fn(spark, sf_dir).collect()}
    spark.conf.set("spark.ssps.reliableCheckpoint", "false")
    local = {(r["id"], r["dist"]) for r in fn(spark, sf_dir).collect()}
    assert reliable == local and reliable
