"""CI guard: every registered query — INCLUDING the zN-tier names the
driver's 50-slot correctness window no longer re-checks — must still
value-match its DuckDB oracle (VERDICT r2 item 6: a refactor must never
silently break a previously-green query).

One test per registered query (parametrized) at sf0.001, using the exact
comparison discipline of scripts/driver_replica.py (sorted column names,
order-insensitive rows, Decimal/date normalization).
"""

from __future__ import annotations

import duckdb
import pytest

from scripts.driver_replica import TABLES, eq, norm
from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry

operators.load_all()
_ALL = sorted(registry.all_queries())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _spark_rows(df):
    cols = sorted(df.columns)
    rows = sorted(
        [tuple(norm(r[c]) for c in cols) for r in df.collect()],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return cols, rows


@pytest.fixture(scope="module")
def prefetched(spark, sf_dir):
    """One Spark execution per query, fanned out over a thread pool
    (guide §2.6) — the per-test granularity (ids, -x behavior, failure
    attribution) is unchanged: each parametrized test consumes its own
    slot and re-raises its own stored error. Before this, every query
    executed TWICE serially in this module (the oracle match and the
    hashability check each re-ran the full query — for streaming queries
    that is a complete micro-batch replay) and the module dominated the
    suite's wall clock."""
    from concurrent.futures import ThreadPoolExecutor

    from spark_state_provider_spark.session import ensure_active_session
    from spark_state_provider_spark.sources.python_source import (
        register_all_python_sources,
    )

    register_all_python_sources(spark)

    def run(name):
        ensure_active_session(spark)  # thread-local JVM active session
        try:
            df = registry.get(name).fn(spark, sf_dir)
            cols, rows = _spark_rows(df)
            return name, (df.schema, cols, rows, None)
        except Exception as e:  # stored; re-raised by the owning test
            return name, (None, None, None, e)

    with ThreadPoolExecutor(max_workers=12) as pool:
        return dict(pool.map(run, _ALL))


def _duck_rows(con, sql):
    cur = con.execute(sql)
    raw = [d[0] for d in cur.description]
    order = sorted(range(len(raw)), key=lambda i: raw[i])
    cols = [raw[i] for i in order]
    rows = sorted(
        [tuple(norm(r[i]) for i in order) for r in cur.fetchall()],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return cols, rows


@pytest.mark.parametrize("name", _ALL)
def test_query_matches_oracle(name, spark, sf_dir, duck, prefetched):
    spec = registry.get(name)
    _, scols, srows, exc = prefetched[name]
    if exc is not None:
        raise exc
    assert srows is not None
    if not spec.oracle:
        pytest.fail(f"{name} has no oracle — registry must stay 100% checkable")
    dcols, drows = _duck_rows(duck, spec.oracle)
    assert scols == dcols, f"{name}: column sets differ: {scols} != {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row counts differ: {len(srows)} != {len(drows)}"
    )
    bad = [
        (s, d)
        for s, d in zip(srows, drows)
        if not all(eq(a, b) for a, b in zip(s, d))
    ]
    assert not bad, f"{name}: {len(bad)} value mismatches, first: {bad[0]}"


@pytest.mark.parametrize("name", _ALL)
def test_query_output_is_driver_hashable(name, spark, sf_dir, duck, prefetched):
    """The driver's value-hash canonicalizer collects both sides to pandas
    and lexsorts every column; list/map/struct cells are unhashable there
    (round-3 red row q51: pandas ``factorize`` raised
    ``TypeError: unhashable type: 'list'``). Guard: no registered query —
    Spark side or oracle side — may emit a nested top-level column. Flatten
    to a joined string (q51/q70) or explode to long form (q86) instead.
    """
    from pyspark.sql import types as T

    spec = registry.get(name)
    schema, _, _, exc = prefetched[name]
    if exc is not None:
        raise exc
    nested = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not nested, (
        f"{name}: nested Spark output columns break the driver hash: {nested}"
    )
    if spec.oracle:
        cur = duck.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
        bad = [
            f"{d[0]}:{d[1]}"
            for d in cur.description
            if any(tok in str(d[1]).lower() for tok in ("list", "struct", "map"))
            or str(d[1]) == "OBJECT"
        ]
        assert not bad, (
            f"{name}: nested oracle output columns break the driver hash: {bad}"
        )
