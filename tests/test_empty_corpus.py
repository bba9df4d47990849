"""Empty-corpus contract: EVERY registered query runs and oracle-matches
on a corpus of zero rows (exact parquet schemas, no rows).

This is the n=0 edge of every fold, window, median, argmax, sink
round-trip, and micro-batch in the engine — the first empty
partition-day a production pipeline meets. The round-7 sweep that
introduced this contract found and fixed eleven defects:

- crash class: dim probes via ``.first()[...]`` (q29b/q91/q200), int() of
  a NULL max (q153), EXECUTE IMMEDIATE on a NULL-spliced view text
  (q148), schema inference on zero-file sink read-backs (q02d, q139,
  q155, q162, q168, and q184's foreachBatch reread);
- divergence class: NULL-vs-0 aggregate shapes (q104, q140, q176, q218/
  q220 funnel counts), md5('')-vs-NULL Merkle roots (q178, q184),
  constant-projection rows Spark's GROUP BY would not emit (q177, q89),
  and the ROLLUP/CUBE/GROUPING SETS grand-total row on empty input
  (q11 family, q209 — Spark emits zero rows; the oracles pin that shape
  with HAVING count(*) > 0).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from tests.oracle import compare_all
from tests.test_advice_edges import SF_SRC

operators.load_all()

_TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory) -> str:
    """All ten tables with their EXACT production schemas and zero rows.
    (pandas ``head(0).to_parquet`` would erase object-column types and
    turn the sweep into a dtype-inference test — use pyarrow.)"""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in _TABLES:
        sch = pq.read_schema(os.path.join(SF_SRC, f"{t}.parquet"))
        pq.write_table(sch.empty_table(), d / f"{t}.parquet")
    return str(d)


def test_every_query_matches_oracle_on_empty_corpus(spark, empty_sf):
    failures = compare_all(spark, empty_sf, sorted(registry.all_queries()))
    assert not failures, (
        f"{len(failures)} queries break the empty-corpus contract:\n"
        + "\n".join(failures)
    )


@pytest.fixture(scope="module")
def singleton_sf(tmp_path_factory) -> str:
    """All ten tables cut to their FIRST row: the n=1 edge of sample
    variance, correlation, allocation weights, and grouped z-scores.
    The round-7 sweep found five defects here (q18b/q69/q159's 0
    denominators raised under ANSI where the oracle NULLs; q27d's Python
    ZeroDivisionError; q89's layout prediction ignoring rows<shards)."""
    d = tmp_path_factory.mktemp("sf_one")
    for t in _TABLES:
        tab = pq.read_table(os.path.join(SF_SRC, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 1), d / f"{t}.parquet")
    return str(d)


def test_every_query_matches_oracle_on_singleton_corpus(spark, singleton_sf):
    failures = compare_all(spark, singleton_sf, sorted(registry.all_queries()))
    assert not failures, (
        f"{len(failures)} queries break the singleton-corpus contract:\n"
        + "\n".join(failures)
    )
