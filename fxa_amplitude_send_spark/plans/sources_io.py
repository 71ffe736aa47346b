"""Source-format coverage queries: each q_source_* round-trips a table
through a non-parquet format (CSV / JSON-lines / ORC) and aggregates the
readback, with the oracle running the same aggregate on the original
parquet — a lossless-ingestion proof that runs under the driver's hash
gate, not just in pytest.

Why aggregate instead of comparing raw rows: the gate then certifies both
the adapter (sources/formats.py) and numeric fidelity (doubles survive the
text formats via shortest-round-trip repr), while keeping result sets
small. The staged copy is written once per (table, format, source mtime)
and cached, so repeated runs only pay the readback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import stage_roundtrip
from .registry import query


@query(
    "q_source_csv",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n,
           ROUND(SUM(c_acctbal), 2) AS sum_acctbal,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV → read back with explicit schema → aggregate. CSV is
    the no-pushdown worst case (row text, no column pruning) — the adapter
    exists for ingestion; the first job after ingest should land parquet."""
    c = stage_roundtrip(spark, sf_dir, "customer", "csv")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@query(
    "q_source_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → read back → aggregate. Exercises nested-quote
    escaping (props holds JSON text inside JSON) and NTZ timestamp
    formatting on the write side; numeric fidelity via shortest-round-trip
    doubles."""
    ev = stage_roundtrip(spark, sf_dir, "events", "json")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q_source_orc",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC → read back → aggregate. ORC keeps columnar pruning
    and predicate pushdown (OrcScan), so it is the format adapter that
    remains 100 TB-viable end to end; binary float storage makes the
    round-trip exact by construction."""
    li = stage_roundtrip(spark, sf_dir, "lineitem", "orc")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )
