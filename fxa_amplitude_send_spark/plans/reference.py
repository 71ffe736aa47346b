"""Reference-surface queries (SURVEY.md §2B part one) adapted to the synthetic
``events`` table (event_id, ts, user_id, event_type, value, props).

Each query is the Spark-first expression of one reference operator family
(utils.js / synchronous-pull.js), with a DuckDB oracle where SQL-expressible.
The HMAC-based ones are rows-only (DuckDB has no HMAC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    hmac_sha256_concat_jvm,
    js_contrib_grid_double,
    js_contrib_long,
    js_contrib_string,
)
from ..sources import load_table
from .registry import query

# Fixed demo key for the pseudonymization queries (the real pipeline takes it
# from PipelineConfig; utils.js:15 reads HMAC_KEY from the environment).
DEMO_HMAC_KEY = "spark-graft-demo-key"


@query(
    "ref_validity_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id IS NOT NULL
      AND length(event_type) > 0
      AND value > 0
    """,
)
def ref_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 isEventOk (utils.js:28-35): id-present ∧ non-empty type ∧ positive
    measure, as one conjunctive predicate Catalyst pushes into the scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("user_id").isNotNull()
        & (F.length("event_type") > 0)
        & (F.col("value") > 0)
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "ref_session_repair",
    oracle="""
    SELECT event_id,
           COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1)
             AS session_id,
           COALESCE(TRY_CAST(event_type AS BIGINT), -1) AS bad_session_id
    FROM events
    """,
)
def ref_session_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 dirty-data repair (utils.js:59-68): string → int coercion with -1
    default, via try_cast instead of a per-row exception path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        F.coalesce(k.try_cast("bigint"), F.lit(-1)).alias("session_id"),
        F.coalesce(F.col("event_type").try_cast("bigint"), F.lit(-1)).alias(
            "bad_session_id"
        ),
    )


@query("ref_pseudonymize")  # rows-only: DuckDB has no HMAC
def ref_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 (utils.js:16-26,70-72): HMAC-SHA256 pseudonymization of user_id via
    the sha2-builtin JVM construction (hashing.py::hmac_sha256_jvm) — no
    Python boundary anywhere in the plan (round-9 replan: the previous
    Arrow pandas UDF cost a 32-worker fan-out for a one-column digest;
    bit-identical by the differential test in tests/test_hashing_jvm.py).
    Applied after projection so the scan reads only two columns."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        hmac_sha256_concat_jvm(
            DEMO_HMAC_KEY, js_contrib_long(F.col("user_id"))
        ).alias("user_id_hashed"),
    )


@query("ref_insert_id_dedup")  # rows-only: HMAC key derivation
def ref_insert_id_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 (utils.js:74): canonical event identity key + exact dedup on it.
    dropDuplicates is a hash aggregate on insert_id — at 100 TB this shuffles
    once on an already-uniform key (HMAC output), so no skew by construction."""
    ev = load_table(spark, sf_dir, "events")
    # JVM sha2-builtin HMAC (round-9 replan, same rationale as
    # ref_pseudonymize); ``value`` rides the engine-wide exact 2-decimal
    # money grid, so its ECMA-262 rendering is the scaled-integer
    # reconstruction (hashing.py::js_contrib_grid_double).
    with_id = ev.withColumn(
        "insert_id",
        hmac_sha256_concat_jvm(
            DEMO_HMAC_KEY,
            js_contrib_long(F.col("user_id")),
            js_contrib_string(F.col("event_type")),
            js_contrib_grid_double(F.col("value"), 2),
        ),
    )
    return with_id.dropDuplicates(["insert_id"]).select(
        "event_id", "insert_id"
    )


@query(
    "ref_identify_split",
    oracle="""
    SELECT event_id,
           '$identify' AS out_event_type,
           user_id,
           0 AS emit_rank
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    UNION ALL
    SELECT event_id, event_type AS out_event_type, user_id, 1 AS emit_rank
    FROM events
    """,
)
def ref_identify_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9-R11 fan-out (utils.js:76-84, synchronous-pull.js:65-72): 1 → 1..2
    rows, synthetic trigger = props.k >= 50 standing in for "has identify
    verb"; identify row first (emit_rank 0). explode over a pre-built array —
    no shuffle, scales with the scan."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    identify = F.when(
        k >= 50,
        F.struct(
            F.col("event_id"),
            F.lit("$identify").alias("out_event_type"),
            F.col("user_id"),
            F.lit(0).alias("emit_rank"),
        ),
    )
    httpapi = F.struct(
        F.col("event_id"),
        F.col("event_type").alias("out_event_type"),
        F.col("user_id"),
        F.lit(1).alias("emit_rank"),
    )
    out = ev.select(
        F.explode(
            F.filter(F.array(identify, httpapi), lambda x: x.isNotNull())
        ).alias("_ev")
    )
    return out.select("_ev.*")


@query(
    "ref_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def ref_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 stringified-JSON column extraction (utils.js:44-50) on events.props."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


@query(
    "ref_batch_metrics",
    oracle="""
    SELECT date_trunc('hour', ts) AS batch_hour,
           min(ts) AS min_ts,
           max(ts) AS max_ts,
           count(*) AS n_events
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
)
def ref_batch_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12-R13 per-batch min/max/count (synchronous-pull.js:54,59-63,94-101)
    over tumbling 1-hour windows. Computes BOTH min and max correctly — the
    reference's else-if quirk is a documented, fixed divergence."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("batch_hour")).agg(
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
