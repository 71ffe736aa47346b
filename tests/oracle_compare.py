"""DuckDB differential comparison mirroring the driver's correctness gate:
row-count + schema + order-insensitive value comparison, columns sorted by
name. Exact equality on canonicalized cells — no tolerance — so anything that
passes here should hash-match in the driver too."""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # merge -0.0/+0.0
        return repr(v)
    if isinstance(v, (datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spark_pd = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        duck_pd = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()

    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
        )
        return problems
    if len(spark_pd) != len(duck_pd):
        problems.append(f"row count: spark={len(spark_pd)} duck={len(duck_pd)}")

    s_rows = canonical_rows(spark_pd)
    d_rows = canonical_rows(duck_pd)
    if s_rows != d_rows:
        diffs = 0
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                problems.append(f"row {i}: spark={a} duck={b}")
                diffs += 1
                if diffs >= 5:
                    problems.append("... (more diffs suppressed)")
                    break
        if len(s_rows) != len(d_rows):
            problems.append(
                f"value rows differ in count after sort: {len(s_rows)} vs {len(d_rows)}"
            )
        if not problems:
            problems.append("rows differ but no positional diff found (ordering)")
    return problems
