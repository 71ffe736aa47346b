"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reference-pipeline query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered engine query and its
DuckDB oracle (SQL-expressible ones only — HMAC/LSH queries are rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module by file path with any cwd; make the
# engine package importable regardless.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from fxa_amplitude_send_spark.plans import all_oracles, all_queries
from fxa_amplitude_send_spark.plans.flagship import flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return all_oracles()
