"""Simulate the external driver against the public contract __spark_entry__.py.

Creates a PLAIN SparkSession (none of the engine's builder confs), imports the
entry module by path exactly like a harness would, then:
  1. smoke: entry(spark) → collect, assert rows >= 0 and stable schema
  2. correctness: for each queries() name, run Spark result and (if present)
     oracle_sql() in DuckDB; compare row count, column names, and an
     order-insensitive value hash over canonicalized rows.

Usage: python tools/driver_sim.py [sf_dir]

Scale-study knobs (all optional, default = full fidelity):
  DRIVER_SIM_ONLY="a,b"   run only these queries
  DRIVER_SIM_SKIP="a,b"   skip these queries (e.g. deliberately-quadratic
                          ORACLES that are intractable above sf0.1 — the
                          engine side stays scale-safe; it is DuckDB's
                          reference formulation that explodes)
  DRIVER_SIM_ORACLE_SKIP="a,b"  run the SPARK side (timed, slope evidence)
                          but skip only the DuckDB oracle, recording a
                          rows-only status that names the reason; for the
                          quadratic-oracle queries at sf10+ where skipping
                          the whole query would lose the scale measurement
  DRIVER_SIM_OUT=path     also write a JSON report with per-query status +
                          spark/oracle wall seconds (slope evidence)
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import math
import os
import sys
from datetime import date, datetime

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, (datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-sim")
        .getOrCreate()
    )

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # --- smoke ---
    edf = mod.entry(spark)
    erows = edf.collect()
    print(f"smoke: entry() rows={len(erows)} cols={len(edf.columns)}")
    assert len(erows) > 0

    # --- correctness ---
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    only = {n for n in os.environ.get("DRIVER_SIM_ONLY", "").split(",") if n}
    skip = {n for n in os.environ.get("DRIVER_SIM_SKIP", "").split(",") if n}
    # Queries whose ENGINE side scales fine but whose DuckDB reference
    # formulation is deliberately brute-force (quadratic pair joins: the geo
    # family, skyline dominance) run Spark-only above the SF where the
    # oracle is tractable — the Spark timing still lands in the slope
    # evidence; the status records rows-only WITH the reason so a record
    # can never silently pass off a skipped oracle as a hash MATCH.
    oracle_skip = {
        n for n in os.environ.get("DRIVER_SIM_ORACLE_SKIP", "").split(",") if n
    }
    if only:
        queries = {n: f for n, f in queries.items() if n in only}
    if skip:
        queries = {n: f for n, f in queries.items() if n not in skip}
    results = {}
    timings: dict[str, dict] = {}
    n_match = n_rows_only = n_fail = 0
    import time as _time

    for name in sorted(queries):
        t0 = _time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {exc}"
            n_fail += 1
            continue
        timings[name] = {"spark_sec": round(_time.perf_counter() - t0, 3)}
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows)"
            n_rows_only += 1
            continue
        if name in oracle_skip:
            results[name] = (
                f"rows-only ({len(sdf)} rows; oracle skipped at this SF — "
                "quadratic reference formulation)"
            )
            n_rows_only += 1
            continue
        t1 = _time.perf_counter()
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            results[name] = f"ORACLE ERROR: {exc}"
            n_fail += 1
            continue
        timings[name]["oracle_sec"] = round(_time.perf_counter() - t1, 3)
        count_ok = len(sdf) == len(ddf)
        schema_ok = sorted(sdf.columns) == sorted(ddf.columns)
        hash_ok = schema_ok and value_hash(sdf) == value_hash(ddf)
        if count_ok and schema_ok and hash_ok:
            results[name] = f"MATCH ({len(sdf)} rows)"
            n_match += 1
        else:
            results[name] = (
                f"MISMATCH count_ok={count_ok} ({len(sdf)} vs {len(ddf)}) "
                f"schema_ok={schema_ok} hash_ok={hash_ok}"
            )
            n_fail += 1

    for name, status in sorted(results.items()):
        print(f"  {name:28s} {status}")
    summary = {
        "match": n_match, "rows_only": n_rows_only, "fail": n_fail, "sf_dir": sf_dir
    }
    out = os.environ.get("DRIVER_SIM_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(
                {"summary": summary, "results": results, "timings": timings},
                fh, indent=1, sort_keys=True,
            )
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
