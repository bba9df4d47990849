"""q226 plan shootout at sf0.1 (round-8 directive #4).

Variants, all output-equivalent to the committed oracle:
  V1  committed plan (df-cap join + self-join, no distinct)
  V2  collect-expand: one groupBy(gram) collects per-doc position lists,
      the pair expansion happens JVM-side inside the grouped row (no
      self-join shuffle)
  V3  V2 + strided candidate filter: phase-1 detects candidate pairs
      from anchors at every 17th position of one side (detect-at-
      K+stride-1 = 32 = threshold guarantee), phase-2 windows run only
      over matches of candidate pairs
Prints min-of-3 noop-sink wall clock per variant + result row counts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_state_provider_spark import operators
from spark_state_provider_spark.session import get_spark
from spark_state_provider_spark.tables import load_table
from spark_state_provider_spark.operators.dedup import (
    _SUB_DF_CAP,
    _SUB_K,
    _SUB_MIN,
    _substring_runs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRIDE = _SUB_MIN - _SUB_K + 1  # 17: detect-at-K+stride-1 == threshold


def _lcs(runs: DataFrame) -> DataFrame:
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            (F.lit(_SUB_K) + F.max("run") - F.lit(1))
            .cast("long")
            .alias("lcs_len")
        )
        .where(F.col("lcs_len") >= _SUB_MIN)
    )


def v1(spark: SparkSession) -> DataFrame:
    return _lcs(_substring_runs(spark, SF_DIR))


def _occ(spark: SparkSession) -> DataFrame:
    d = (
        load_table(spark, SF_DIR, "documents")
        .where(F.length("text") >= _SUB_K)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    g = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {_SUB_K - 1}), "
                f"i -> struct(i AS i, substring(text, i, {_SUB_K}) AS gram))"
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.i").alias("i"), F.col("x.gram").alias("gram"))
    c1 = g.groupBy("gram", "doc_id").agg(F.collect_list("i").alias("ps"))
    wg = Window.partitionBy("gram")
    c2 = c1.withColumn("df", F.count("*").over(wg)).where(
        F.col("df") <= _SUB_DF_CAP
    )
    return c2.groupBy("gram").agg(
        F.collect_list(F.struct("doc_id", "ps")).alias("ds")
    )


_EXPAND = """
flatten(flatten(transform(ds, a ->
  transform(filter(ds, b -> b.doc_id > a.doc_id), b ->
    flatten(transform(a.ps, pa ->
      transform(b.ps, pb ->
        struct(a.doc_id AS doc_a, b.doc_id AS doc_b,
               pa AS pa, pa - pb AS diag))))))))
"""


def _windows(m: DataFrame) -> DataFrame:
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = m.withColumn("grp", F.col("pa") - F.row_number().over(w))
    runs = isl.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        F.count("*").cast("long").alias("run")
    )
    return _lcs(runs)


def v2(spark: SparkSession) -> DataFrame:
    occ = _occ(spark)
    m = occ.select(F.explode(F.expr(_EXPAND)).alias("p")).select("p.*")
    return _windows(m)


_CAND = f"""
flatten(transform(ds, a ->
  transform(filter(ds, b -> b.doc_id != a.doc_id
                            AND exists(b.ps, p -> p % {STRIDE} = 1)), b ->
    struct(least(a.doc_id, b.doc_id) AS doc_a,
           greatest(a.doc_id, b.doc_id) AS doc_b))))
"""


def v3(spark: SparkSession) -> DataFrame:
    occ = _occ(spark)
    cand = (
        occ.select(F.explode(F.expr(_CAND)).alias("c"))
        .select("c.*")
        .distinct()
    )
    m = occ.select(F.explode(F.expr(_EXPAND)).alias("p")).select("p.*")
    m = m.join(F.broadcast(cand), ["doc_a", "doc_b"], "left_semi")
    return _windows(m)


def main() -> None:
    operators.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="q226-exp", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    for name, fn in (("v1", v1), ("v2", v2), ("v3", v3)):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        n = fn(spark).count()
        print(f"{name}: min={min(runs)} runs={runs} rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


# --- round 2 of the shootout: V4 one-shuffle occ + fold runs, V5 = V4+stride


def _occ4(spark: SparkSession) -> DataFrame:
    d = (
        load_table(spark, SF_DIR, "documents")
        .where(F.length("text") >= _SUB_K)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    g = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {_SUB_K - 1}), "
                f"i -> struct(i AS i, substring(text, i, {_SUB_K}) AS gram))"
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.i").alias("i"), F.col("x.gram").alias("gram"))
    return (
        g.groupBy("gram")
        .agg(F.collect_list(F.struct("doc_id", "i")).alias("os"))
        .where(
            F.size(F.expr("array_distinct(transform(os, o -> o.doc_id))"))
            <= _SUB_DF_CAP
        )
    )


_EXPAND4 = """
flatten(transform(os, a ->
  transform(filter(os, b -> a.doc_id < b.doc_id), b ->
    struct(a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.i AS pa, a.i - b.i AS diag))))
"""

_BEST_RUN = """
aggregate(ps,
  struct(CAST(-2147483648 AS INT) AS prev, 0 AS cur, 0 AS best),
  (s, x) -> named_struct(
     'prev', x,
     'cur', IF(x = s.prev + 1, s.cur + 1, 1),
     'best', GREATEST(s.best, IF(x = s.prev + 1, s.cur + 1, 1))),
  s -> s.best)
"""


def _fold_lcs(m: DataFrame) -> DataFrame:
    per_diag = (
        m.groupBy("doc_a", "doc_b", "diag")
        .agg(F.sort_array(F.collect_list("pa")).alias("ps"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(_BEST_RUN).cast("long").alias("best"),
        )
    )
    return (
        per_diag.groupBy("doc_a", "doc_b")
        .agg(
            (F.lit(_SUB_K) + F.max("best") - F.lit(1))
            .cast("long")
            .alias("lcs_len")
        )
        .where(F.col("lcs_len") >= _SUB_MIN)
    )


def v4(spark: SparkSession) -> DataFrame:
    occ = _occ4(spark)
    m = occ.select(F.explode(F.expr(_EXPAND4)).alias("p")).select("p.*")
    return _fold_lcs(m)


_CAND4 = f"""
flatten(transform(os, a ->
  transform(filter(os, b -> b.doc_id != a.doc_id
                            AND b.i % {STRIDE} = 1), b ->
    struct(least(a.doc_id, b.doc_id) AS doc_a,
           greatest(a.doc_id, b.doc_id) AS doc_b))))
"""


def v5(spark: SparkSession) -> DataFrame:
    occ = _occ4(spark)
    cand = (
        occ.select(F.explode(F.expr(_CAND4)).alias("c"))
        .select("c.*")
        .distinct()
    )
    m = occ.select(F.explode(F.expr(_EXPAND4)).alias("p")).select("p.*")
    m = m.join(F.broadcast(cand), ["doc_a", "doc_b"], "left_semi")
    return _fold_lcs(m)


def main2() -> None:
    operators.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="q226-exp2", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    for name, fn in (("v4", v4), ("v5", v5), ("v2", v2)):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        n = fn(spark).count()
        print(f"{name}: min={min(runs)} runs={runs} rows={n}", flush=True)
    spark.stop()


# --- round 3: single pair-level shuffle, fold over (diag, pa)

_BEST_RUN2 = """
aggregate(ps,
  struct(CAST(-2147483648 AS INT) AS prevd, CAST(-2147483648 AS INT) AS prevp,
         0 AS cur, 0 AS best),
  (s, x) -> named_struct(
     'prevd', x.diag,
     'prevp', x.pa,
     'cur', IF(x.diag = s.prevd AND x.pa = s.prevp + 1, s.cur + 1, 1),
     'best', GREATEST(s.best,
                      IF(x.diag = s.prevd AND x.pa = s.prevp + 1,
                         s.cur + 1, 1))),
  s -> s.best)
"""


def _fold_lcs2(m: DataFrame) -> DataFrame:
    return (
        m.groupBy("doc_a", "doc_b")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("diag", "pa"))
            ).alias("ps")
        )
        .select(
            "doc_a",
            "doc_b",
            (F.lit(_SUB_K) + F.expr(_BEST_RUN2) - F.lit(1))
            .cast("long")
            .alias("lcs_len"),
        )
        .where(F.col("lcs_len") >= _SUB_MIN)
    )


def v6(spark: SparkSession) -> DataFrame:
    occ = _occ4(spark)
    m = occ.select(F.explode(F.expr(_EXPAND4)).alias("p")).select("p.*")
    return _fold_lcs2(m)


def v7(spark: SparkSession) -> DataFrame:
    occ = _occ4(spark)
    cand = (
        occ.select(F.explode(F.expr(_CAND4)).alias("c"))
        .select("c.*")
        .distinct()
    )
    m = occ.select(F.explode(F.expr(_EXPAND4)).alias("p")).select("p.*")
    m = m.join(F.broadcast(cand), ["doc_a", "doc_b"], "left_semi")
    return _fold_lcs2(m)


def main3() -> None:
    operators.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="q226-exp3", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    for name, fn in (("v6", v6), ("v7", v7), ("v4", v4)):
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        n = fn(spark).count()
        print(f"{name}: min={min(runs)} runs={runs} rows={n}", flush=True)
    spark.stop()
