"""Targeted oracle check: like driver_replica.py but only for the canonical
query names given on the command line (fast iteration while adding
operators).

Usage: python scripts/check_queries.py name [name ...] [--sf DIR]
"""

from __future__ import annotations

import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from scripts.driver_replica import TABLES, eq, norm  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from spark_state_provider_spark import operators
    from spark_state_provider_spark.operators import registry

    operators.load_all()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in names:
        spec = registry.get(name)
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(
                [tuple(norm(r[c]) for c in cols) for r in sdf.collect()],
                key=lambda t: tuple((x is None, str(x)) for x in t),
            )
            status = f"{len(srows):>7} rows"
            if spec.oracle:
                cur = con.execute(spec.oracle)
                dcols_raw = [d[0] for d in cur.description]
                order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
                dcols = [dcols_raw[i] for i in order]
                drows = sorted(
                    [tuple(norm(r[i]) for i in order) for r in cur.fetchall()],
                    key=lambda t: tuple((x is None, str(x)) for x in t),
                )
                if cols != dcols:
                    raise AssertionError(f"cols {cols} != {dcols}")
                if len(srows) != len(drows):
                    raise AssertionError(f"rows {len(srows)} != {len(drows)}")
                bad = [
                    (s, d)
                    for s, d in zip(srows, drows)
                    if not all(eq(a, b) for a, b in zip(s, d))
                ]
                if bad:
                    raise AssertionError(
                        f"{len(bad)} value mismatches, first: {bad[0]}"
                    )
                status += " ORACLE-MATCH"
            else:
                status += " (rows-only)"
            print(f"  {name:<28} {status}  {time.time()-t0:.1f}s")
        except Exception as ex:
            failures.append(name)
            print(f"  {name:<28} FAIL: {str(ex)[:400]}")
    spark.stop()
    print(f"{len(names) - len(failures)}/{len(names)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
