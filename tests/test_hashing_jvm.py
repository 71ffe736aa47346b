"""Differential proof that the JVM sha2-builtin HMAC path (round-9
optimization: ArrowEvalPython removed from every hashing query) is
bit-identical to the Python reference coercion + hmac, on golden vectors AND
over the real events table for each replanned query's exact value domain."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fxa_amplitude_send_spark.functions.hashing import (
    hmac_sha256_concat_jvm,
    hmac_sha256_jvm,
    hmac_sha256_py,
    js_contrib_grid_double,
    js_contrib_long,
    js_contrib_string,
)

KEY = "jvm-twin-test-key"


def test_raw_hmac_matches_python(spark):
    """hmac_sha256_jvm == hmac.new(key, m, sha256).hexdigest() for raw
    string messages (empty message included — HMAC of b'')."""
    msgs = ["", "a", "hello world", "0", "ü-unicode-ß", "x" * 1000]
    df = spark.createDataFrame([(m,) for m in msgs], "m string")
    got = {
        r.m: r.h
        for r in df.select("m", hmac_sha256_jvm(KEY, F.col("m")).alias("h")).collect()
    }
    import hashlib
    import hmac as hm

    for m in msgs:
        exp = hm.new(KEY.encode(), m.encode(), hashlib.sha256).hexdigest()
        assert got[m] == exp, m


def test_long_key_padding(spark):
    """Keys longer than the 64-byte SHA-256 block are pre-hashed (RFC 2104)."""
    long_key = "k" * 100
    df = spark.createDataFrame([("payload",)], "m string")
    got = df.select(hmac_sha256_jvm(long_key, F.col("m")).alias("h")).first().h
    import hashlib
    import hmac as hm

    assert got == hm.new(long_key.encode(), b"payload", hashlib.sha256).hexdigest()


GOLDEN_TRIPLES = [
    # (user_id long, event_type string, value double-on-2dec-grid)
    (123, "click", 29.27),
    (0, "click", 29.27),  # falsy long skipped
    (None, "view", 122.79),  # null long skipped
    (-45, "error", 2.11),  # negative long renders with sign
    (7, "", 10.0),  # empty string skipped; 10.0 -> "10"
    (7, None, 0.25),  # null string skipped; 0.25 -> "0.25"
    (7, "t", 0.0),  # falsy double skipped
    (7, "t", None),  # null double skipped
    (7, "t", -3.5),  # negative grid double -> "-3.5"
    (7, "t", 1000000.05),  # trailing-zero stripping in the cents frac
]


def test_concat_contribs_match_python_reference(spark):
    df = spark.createDataFrame(
        GOLDEN_TRIPLES, "user_id long, event_type string, value double"
    )
    out = df.select(
        "user_id",
        "event_type",
        "value",
        hmac_sha256_concat_jvm(
            KEY,
            js_contrib_long(F.col("user_id")),
            js_contrib_string(F.col("event_type")),
            js_contrib_grid_double(F.col("value"), 2),
        ).alias("h"),
    ).collect()
    for r in out:
        assert r.h == hmac_sha256_py(KEY, r.user_id, r.event_type, r.value), (
            r.user_id,
            r.event_type,
            r.value,
        )


def test_grid3_millis_contrib_matches_python(spark):
    """The millis-grid (scale 3) coercion used for event time/session_id:
    integral ms, sub-ms fractions, negatives, and the -1 repair sentinel."""
    vals = [
        1704067200123.0,
        1704067211172.425,
        1704067254840.621,
        -1.0,
        0.5,
        123000.0,
        0.001,
        4398046511103.999,  # ~2^42 ms, upper edge of the documented domain
    ]
    df = spark.createDataFrame([(v,) for v in vals], "t double")
    out = df.select(
        "t", hmac_sha256_concat_jvm(KEY, js_contrib_grid_double(F.col("t"), 3)).alias("h")
    ).collect()
    for r in out:
        assert r.h == hmac_sha256_py(KEY, r.t), r.t


def test_ref_queries_match_python_over_events(spark, sf_correctness):
    """Full-table differential at sf0.01: the replanned ref_pseudonymize /
    ref_insert_id_dedup digests equal the Python reference implementation
    row by row over the real events value domain."""
    from fxa_amplitude_send_spark.plans.reference import DEMO_HMAC_KEY
    from fxa_amplitude_send_spark.sources import load_table

    ev = load_table(spark, sf_correctness, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    got = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        hmac_sha256_concat_jvm(
            DEMO_HMAC_KEY, js_contrib_long(F.col("user_id"))
        ).alias("h1"),
        hmac_sha256_concat_jvm(
            DEMO_HMAC_KEY,
            js_contrib_long(F.col("user_id")),
            js_contrib_string(F.col("event_type")),
            js_contrib_grid_double(F.col("value"), 2),
        ).alias("h2"),
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r.h1 == hmac_sha256_py(DEMO_HMAC_KEY, r.user_id), r
        assert r.h2 == hmac_sha256_py(
            DEMO_HMAC_KEY, r.user_id, r.event_type, r.value
        ), r


def test_event_pipeline_jvm_equals_pandas_path(spark, sf_correctness):
    """The whole flagship pipeline with hash_in_jvm=True is row-identical to
    the pandas-UDF path over the synthesized payloads at sf0.01 — the
    end-to-end equivalence that lets the optimization claim 'same query,
    no Python boundary'."""
    from fxa_amplitude_send_spark.operators.event_pipeline import event_pipeline
    from fxa_amplitude_send_spark.plans.flagship import (
        FLAGSHIP_HMAC_KEY,
        staged_payloads,
    )

    pay = staged_payloads(spark, sf_correctness)
    jvm = event_pipeline(pay, FLAGSHIP_HMAC_KEY, hash_in_jvm=True)
    py = event_pipeline(pay, FLAGSHIP_HMAC_KEY, hash_in_jvm=False)
    assert jvm.columns == py.columns

    def comparable(df):
        # set operations reject MAP columns; sorted entries are the
        # order-insensitive equivalent
        return df.withColumn(
            "user_properties", F.sort_array(F.map_entries("user_properties"))
        )

    jvm, py = comparable(jvm), comparable(py)
    assert jvm.count() == py.count()
    assert jvm.exceptAll(py).count() == 0
    assert py.exceptAll(jvm).count() == 0


def test_pipeline_plan_has_no_python_eval(spark, sf_smoke):
    """The optimization's plan claim: zero BatchEvalPython/ArrowEvalPython
    nodes anywhere in the flagship physical plan."""
    from fxa_amplitude_send_spark.plans.flagship import ref_event_pipeline

    df = ref_event_pipeline(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
