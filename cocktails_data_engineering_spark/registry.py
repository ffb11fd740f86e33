"""Query registry.

Every operator the engine exposes registers itself here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics are
ANSI-SQL-expressible) an equivalent DuckDB SQL string used as a
correctness oracle over the same parquet tables.

Column-name discipline: the oracle comparison sorts columns by NAME and
hashes values, so the Spark DataFrame and the oracle SQL must produce
identical column names.  Every computed column is aliased on both sides.
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
    oracle: str | None  # ANSI SQL for DuckDB, or None for rows-only checks
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]


def specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)
