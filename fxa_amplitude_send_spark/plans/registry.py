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


#: Integration-gate queries: multi-commit lakehouse lifecycles and
#: multi-micro-batch streaming replays whose measured time is dominated by
#: correctness MACHINERY (a dozen Spark jobs of commits/replays per run),
#: not by the plan under test. bench.py reports their mean separately from
#: the core analytic mean so round-over-round comparisons stay
#: apples-to-apples as the gate count grows (round-6 verdict item 3).
_GATE_PREFIXES = ("q_stream_", "q_mv_", "q_versioned_")
_GATE_EXTRAS = frozenset(
    {
        "q_cdf_read",
        "q_check_constraints",
        "llm_ingest_neardup",
        # round 7: stages a hive-partitioned copy before the pruned reads
        "q_source_partitioned",
        # round 9: pays the one-time bucketed lineitem write in-gate (the
        # recurring run's cost is the point; sf10/sf100 studies measure it
        # separately via the prebuild-then-remeasure pattern)
        "q_tpch_q18_bucketed",
    }
)


def is_gate(name: str) -> bool:
    """True if ``name`` is an integration-gate query (machinery-dominated)."""
    return name.startswith(_GATE_PREFIXES) or name in _GATE_EXTRAS
