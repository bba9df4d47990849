"""Query registry backing the driver contract.

Each entry couples a PySpark query callable ``(spark, sf_dir) -> DataFrame``
with (optionally) the equivalent DuckDB ANSI-SQL oracle string. Column names
MUST match between the two — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""
    # Fuzz-family membership, declared AT THE REGISTRATION SITE so the
    # proof matrix is registry-driven rather than name-listed in tests
    # (round-7 verdict #8: every new query must join the fuzz families
    # before its debut window). ``None`` = legacy query registered before
    # the field existed (tests carry the historical name lists); ``()`` =
    # explicitly no family applies (say why in the docstring). Known
    # family keys: text, events, tpch, embeddings, streaming, nulljoin,
    # dates, multibyte.
    fuzz: tuple[str, ...] | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    fuzz: tuple[str, ...] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", fuzz=fuzz
        )
        return fn

    return deco


def fuzz_family(family: str) -> list[str]:
    """Names that DECLARED membership in ``family`` at registration.
    Test files extend their historical name lists with this, so a new
    query joins the matrix by declaring itself — no test edit needed."""
    return sorted(
        name
        for name, spec in _REGISTRY.items()
        if spec.fuzz is not None and family in spec.fuzz
    )


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(_REGISTRY.items())
        if spec.oracle is not None
    }


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]
