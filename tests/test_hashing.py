"""Golden tests for HMAC-SHA256 parity with the reference's hash()
(utils.js:16-26): falsy-skipping, JS string coercion, no separator."""

from __future__ import annotations

import hashlib
import hmac

import pyspark.sql.functions as F

from fxa_amplitude_send_spark.functions.hashing import (
    hmac_sha256,
    hmac_sha256_py,
    js_string_coerce,
)

KEY = "test-key"


def expected(concat: str) -> str:
    return hmac.new(KEY.encode(), concat.encode(), hashlib.sha256).hexdigest()


def test_basic_concat_no_separator():
    # hash(key, 'u-1', 'd-1') must equal HMAC over 'u-1d-1'
    assert hmac_sha256_py(KEY, "u-1", "d-1") == expected("u-1d-1")


def test_falsy_args_skipped():
    # utils.js:20 — null/''/0/NaN contribute nothing
    assert hmac_sha256_py(KEY, None, "", 0, "x", 0.0, float("nan")) == expected("x")
    assert hmac_sha256_py(KEY) == expected("")


def test_js_number_coercion():
    # String(1704067200000) and String(5.0) === '5'; String(1.5) === '1.5'
    assert js_string_coerce(1704067200000) == "1704067200000"
    assert js_string_coerce(5.0) == "5"
    assert js_string_coerce(1.5) == "1.5"
    assert js_string_coerce(-1.0) == "-1"
    assert js_string_coerce(0) is None
    assert js_string_coerce("") is None
    assert js_string_coerce(False) is None
    assert js_string_coerce(True) == "true"


def test_ecmascript_number_to_string_thresholds():
    """Golden vectors from ECMA-262 Number::toString(10) — the ranges where
    Python repr and JS diverge (ADVICE r1): decimal notation down to 1e-7,
    unpadded exponents, 'Infinity' spelling. Expected strings are exactly
    what Node's String(v) returns."""
    vectors = {
        5e-05: "0.00005",        # Python repr: '5e-05'
        -5e-05: "-0.00005",
        1.5e-05: "0.000015",
        1e-06: "0.000001",       # last decimal magnitude
        1e-07: "1e-7",           # first exponential, unpadded (repr: '1e-07')
        1.5e-07: "1.5e-7",
        2.5e-10: "2.5e-10",
        0.1: "0.1",
        123.456: "123.456",
        1e21: "1e+21",           # integral but >= 1e21 → exponential
        1.5e21: "1.5e+21",
        -1e21: "-1e+21",
        1.2345678901234568e18: "1234567890123456800",
        float("inf"): "Infinity",
        float("-inf"): "-Infinity",
    }
    for value, want in vectors.items():
        assert js_string_coerce(value) == want, (value, js_string_coerce(value))


def test_hmac_parity_on_small_fractions(spark):
    """The divergence range is reachable through time/session_id doubles —
    the UDF and the driver reference must agree on the JS layout."""
    df = spark.createDataFrame(
        [("u", 5e-05), ("u", 1e-07), ("u", 1.5e21)],
        "user_id string, session_id double",
    )
    out = df.select(
        "user_id",
        "session_id",
        hmac_sha256(KEY, F.col("user_id"), F.col("session_id")).alias("h"),
    ).collect()
    for r in out:
        assert r["h"] == hmac_sha256_py(KEY, r["user_id"], r["session_id"])
    assert hmac_sha256_py(KEY, "u", 5e-05) == expected("u0.00005")
    assert hmac_sha256_py(KEY, "u", 1e-07) == expected("u1e-7")


def test_insert_id_shape():
    # insert_id = hash(key, hashed_user, device, session, type, time) — the
    # session_id/time arrive as doubles but hash as integer strings.
    hashed_user = hmac_sha256_py(KEY, "u-1")
    got = hmac_sha256_py(
        KEY, hashed_user, "d-1", 1704067100000.0, "login", 1704067200000.0
    )
    concat = hashed_user + "d-1" + "1704067100000" + "login" + "1704067200000"
    assert got == expected(concat)


def test_udf_matches_python(spark):
    rows = [
        ("u-1", "d-1", 1704067100000.0),
        (None, "d-2", 0.0),
        ("", "d-3", 123.5),
    ]
    df = spark.createDataFrame(rows, "user_id string, device_id string, session_id double")
    out = df.select(
        "user_id",
        "device_id",
        "session_id",
        hmac_sha256(KEY, F.col("user_id"), F.col("device_id"), F.col("session_id")).alias("h"),
    ).collect()
    for r in out:
        assert r["h"] == hmac_sha256_py(KEY, r["user_id"], r["device_id"], r["session_id"])


def test_rolling_fingerprint_order_sensitive(spark):
    from pyspark.sql import functions as F

    from fxa_amplitude_send_spark.functions.hashing import rolling_fingerprint

    df = spark.createDataFrame(
        [
            (1, ["the", "quick", "brown", "fox"]),
            (2, ["the", "quick", "brown", "fox"]),   # identical stream
            (3, ["fox", "brown", "quick", "the"]),   # same bag, reversed
            (4, []),                                  # empty stream
        ],
        "doc_id long, toks array<string>",
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", rolling_fingerprint(F.col("toks")).alias("fp")).collect()
    }
    assert fps[1] == fps[2]          # deterministic
    assert fps[1] != fps[3]          # order-sensitive: permutation differs
    assert fps[4] == 0               # empty stream → identity accumulator
    P = (1 << 31) - 1
    assert all(0 <= v < P for v in fps.values())
