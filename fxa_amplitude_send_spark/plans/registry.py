"""Query/oracle registry.

Each engine query is a callable ``(spark, sf_dir) -> DataFrame`` registered
under a stable name; SQL-expressible queries also carry the equivalent ANSI
SQL that DuckDB runs on the same parquet tables for differential checking.

Column-name discipline: the driver's comparator sorts columns by name before
hashing values, so every computed column is aliased identically in the Spark
plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


def get_query(name: str) -> QueryFn:
    return _QUERIES[name]
