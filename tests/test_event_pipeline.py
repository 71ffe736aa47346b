"""Reference-semantics fixture tests (FIXTURES.md §B): each quirk of
utils.js:37-90 exercised with hand-built payloads and golden expectations."""

from __future__ import annotations

import json

import pytest

from fxa_amplitude_send_spark.functions.hashing import hmac_sha256_py
from fxa_amplitude_send_spark.operators.event_pipeline import (
    event_pipeline,
    parse_envelope,
    quarantine_split,
)

KEY = "test-key"

BASE_EVENT = {
    "device_id": "d-1",
    "user_id": "u-1",
    "event_type": "fxa_login - complete",
    "time": 1704067200000,
    "session_id": 1704067100000,
    "event_properties": {"service": "sync"},
    "user_properties": {"$set": {"ua_browser": "Firefox"}, "flow_id": "f-1"},
}


def payload_df(spark, *payloads):
    return spark.createDataFrame([(json.dumps(p),) for p in payloads], "payload string")


def run(spark, *payloads, fanout=True):
    df = payload_df(spark, *payloads)
    return event_pipeline(df, KEY, fanout=fanout).collect()


def test_envelope_fields_with_stringified_props(spark):
    ev = dict(BASE_EVENT)
    ev["event_properties"] = json.dumps(ev["event_properties"])
    ev["user_properties"] = json.dumps(ev["user_properties"])
    rows = run(spark, {"Fields": ev})
    assert len(rows) == 2  # identify + httpapi
    httpapi = [r for r in rows if r.emit_rank == 1][0]
    assert json.loads(httpapi.event_properties) == {"service": "sync"}
    assert httpapi.user_properties == {"flow_id": "f-1"}


def test_envelope_op_data(spark):
    inner = dict(BASE_EVENT, user_properties={"flow_id": "f-9"})
    rows = run(spark, {"Fields": {"op": "insert", "data": json.dumps(inner)}})
    assert len(rows) == 1
    assert rows[0].event_type == "fxa_login - complete"
    assert rows[0].user_properties == {"flow_id": "f-9"}


def test_envelope_bare(spark):
    rows = run(spark, dict(BASE_EVENT, user_properties={"k": "v"}))
    assert len(rows) == 1
    assert rows[0].device_id == "d-1"


@pytest.mark.parametrize(
    "patch",
    [
        {"device_id": "", "user_id": ""},
        {"device_id": None, "user_id": None},
        {"event_type": ""},
        {"time": 0},
        {"time": -5},
        {"time": None},
        {"time": "1704067200000"},  # string time fails is.positive (utils.js:34)
    ],
)
def test_invalid_events_dropped(spark, patch):
    ev = dict(BASE_EVENT)
    ev.update(patch)
    assert run(spark, ev) == []


def test_device_only_kept_and_hash_skips_falsy_user(spark):
    ev = dict(BASE_EVENT)
    del ev["user_id"]
    ev["user_properties"] = {"plain": "x"}
    rows = run(spark, ev)
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id is None
    # insert_id: falsy user_id contributes nothing (utils.js:19-23)
    assert r.insert_id == hmac_sha256_py(
        KEY, None, "d-1", 1704067100000.0, "fxa_login - complete", 1704067200000.0
    )


def test_session_numeric_string_repaired(spark):
    ev = dict(BASE_EVENT, session_id="1704067100000", user_properties={"a": "b"})
    rows = run(spark, ev)
    assert rows[0].session_id == 1704067100000.0


def test_session_parseint_prefix(spark):
    # JS parseInt('123abc', 10) === 123 — prefix parse, not try_cast
    ev = dict(BASE_EVENT, session_id="123abc", user_properties={"a": "b"})
    rows = run(spark, ev)
    assert rows[0].session_id == 123.0


def test_session_garbage_to_minus_one(spark):
    ev = dict(BASE_EVENT, session_id="not-a-number", user_properties={"a": "b"})
    rows = run(spark, ev)
    assert rows[0].session_id == -1.0


def test_numeric_session_untouched(spark):
    ev = dict(BASE_EVENT, session_id=123.5, user_properties={"a": "b"})
    rows = run(spark, ev)
    assert rows[0].session_id == 123.5


def test_identify_split_order_and_payload(spark):
    rows = run(spark, BASE_EVENT)
    assert len(rows) == 2
    identify, httpapi = sorted(rows, key=lambda r: r.emit_rank)
    assert identify.event_type == "$identify"
    assert identify.emit_rank == 0  # identify FIRST (synchronous-pull.js:66)
    assert set(identify.user_properties) == {"$set"}
    assert json.loads(identify.user_properties["$set"]) == {"ua_browser": "Firefox"}
    assert httpapi.user_properties == {"flow_id": "f-1"}  # verbs removed
    assert identify.insert_id is None  # identify carries no insert_id (utils.js:78-83)
    assert httpapi.insert_id is not None


def test_identify_all_verbs(spark):
    up = {"$set": {"a": 1}, "$setOnce": {"b": 2}, "$add": {"c": 3}, "$append": {"d": 4}, "$unset": {"e": 5}}
    ev = dict(BASE_EVENT, user_properties=up)
    rows = run(spark, ev)
    identify = [r for r in rows if r.emit_rank == 0][0]
    assert set(identify.user_properties) == set(up)
    httpapi = [r for r in rows if r.emit_rank == 1][0]
    assert httpapi.user_properties == {}


def test_no_identify_for_plain_props(spark):
    ev = dict(BASE_EVENT, user_properties={"flow_id": "f-1"})
    rows = run(spark, ev)
    assert len(rows) == 1
    assert rows[0].event_type == "fxa_login - complete"


def test_null_verb_without_assignment_kept_on_httpapi(spark):
    # {"$set": null} with no ASSIGNED verb: the reference never calls
    # splitIdentifyPayload (utils.js:76-84 gates on a non-null verb value),
    # so no identify event is emitted AND the null verb key survives on the
    # httpapi copy — verb stripping must be gated on has_verb.
    ev = dict(BASE_EVENT, user_properties={"$set": None, "flow_id": "f-1"})
    rows = run(spark, ev)
    assert len(rows) == 1
    assert rows[0].event_type == "fxa_login - complete"
    assert set(rows[0].user_properties) == {"$set", "flow_id"}
    assert rows[0].user_properties["$set"] is None
    assert rows[0].user_properties["flow_id"] == "f-1"


def test_missing_user_properties_divergence(spark):
    # reference throws (utils.js:77); engine emits httpapi only (SURVEY.md §2A)
    ev = dict(BASE_EVENT)
    del ev["user_properties"]
    rows = run(spark, ev)
    assert len(rows) == 1
    assert rows[0].user_properties is None


def test_user_id_hashed_before_insert_id(spark):
    rows = run(spark, BASE_EVENT)
    httpapi = [r for r in rows if r.emit_rank == 1][0]
    hashed_user = hmac_sha256_py(KEY, "u-1")
    assert httpapi.user_id == hashed_user
    assert httpapi.insert_id == hmac_sha256_py(
        KEY,
        hashed_user,
        "d-1",
        1704067100000.0,
        "fxa_login - complete",
        1704067200000.0,
    )


def test_duplicate_pair_same_insert_id(spark):
    rows = run(spark, dict(BASE_EVENT, user_properties={}), dict(BASE_EVENT, user_properties={}))
    assert len(rows) == 2
    assert rows[0].insert_id == rows[1].insert_id


def test_quarantine_split(spark):
    good = dict(BASE_EVENT, user_properties={})
    bad = dict(BASE_EVENT, event_type="")
    df = payload_df(spark, good, bad)
    ok, quarantined = quarantine_split(df)
    assert ok.count() == 1
    assert quarantined.count() == 1


def test_parse_envelope_distinguishes_string_time(spark):
    df = payload_df(spark, dict(BASE_EVENT, time="1704067200000"))
    parsed = parse_envelope(df).collect()[0]
    assert parsed.time is None  # string time is not a number (is.positive fails)


def test_decode_pubsub_base64_roundtrip(spark):
    """R3 (synchronous-pull.js:57): base64 message data → JSON → jsonPayload
    projection, feeding the same pipeline as pre-decoded payloads."""
    import base64

    from fxa_amplitude_send_spark.operators.event_pipeline import decode_pubsub

    msg = {"jsonPayload": {"Fields": dict(BASE_EVENT)}, "other": "ignored"}
    data = base64.b64encode(json.dumps(msg).encode()).decode()
    df = spark.createDataFrame([(data,)], "data string")
    decoded = decode_pubsub(df)
    payload = decoded.collect()[0]["payload"]
    assert json.loads(payload) == {"Fields": BASE_EVENT}

    # end-to-end: decoded payload runs the full pipeline (identify + httpapi)
    rows = event_pipeline(decoded, KEY).collect()
    assert [r["event_type"] for r in rows] == ["$identify", "fxa_login - complete"]
    assert rows[1]["user_id"] == hmac_sha256_py(KEY, "u-1")


def test_decode_pubsub_plaintext_mode(spark):
    """base64_encoded=False covers sources that deliver JSON text directly
    (file replays, memory streams)."""
    from fxa_amplitude_send_spark.operators.event_pipeline import decode_pubsub

    msg = json.dumps({"jsonPayload": {"Fields": dict(BASE_EVENT)}})
    df = spark.createDataFrame([(msg,)], "data string")
    payload = decode_pubsub(df, base64_encoded=False).collect()[0]["payload"]
    assert json.loads(payload)["Fields"]["device_id"] == "d-1"


def test_garbage_payloads_dropped_not_crashed(spark):
    """Whole-payload corruption (non-JSON, truncated, empty, wrong shapes)
    must flow through decode → parse → validity as NULL-extracted fields
    and be DROPPED, never raise — the engine analogue of the reference's
    per-message try/catch surviving a poisoned queue message."""
    import json as _json

    from fxa_amplitude_send_spark.operators.event_pipeline import event_pipeline

    garbage = [
        "this is not json",
        '{"Fields": {"op"',  # truncated mid-key
        "",
        "null",
        "[1, 2, 3]",
        '"just a string"',
        _json.dumps({"Fields": "not-an-object"}),
        _json.dumps({"unrelated": {"deeply": ["nested"]}}),
    ]
    df = spark.createDataFrame([(g,) for g in garbage], "payload string")
    out = event_pipeline(df, KEY).collect()
    assert out == []

    # a valid event surrounded by garbage still comes through
    mixed = garbage[:4] + [_json.dumps(BASE_EVENT)] + garbage[4:]
    df2 = spark.createDataFrame([(g,) for g in mixed], "payload string")
    out2 = event_pipeline(df2, KEY).collect()
    assert {r.emit_rank for r in out2} == {0, 1}  # identify + httpapi


def test_once_barrier_survives_optimizer(spark):
    """The evaluate-once barrier must survive Catalyst.

    Regression: ``F.when(F.rand(7) >= -1.0, col)`` was folded away by Spark
    4.1's literal-range analysis, after which filter pushdown inlined the
    whole parse tree into the scan predicate (37 from_json + 49
    get_json_object in the flagship plan, +0.7 s at sf0.1). The barrier is
    correct only if each parse appears EXACTLY ONCE in the optimized plan
    even with the validity filter on top.
    """
    from fxa_amplitude_send_spark.operators.event_pipeline import (
        validity_predicate,
    )

    df = payload_df(spark, BASE_EVENT)
    valid = parse_envelope(df).filter(validity_predicate())
    plan = valid._jdf.queryExecution().optimizedPlan().toString()
    # 4 from_json (_opdata, _text, _nums, user_properties) + 1 get_json_object
    # (_fields); any substitution multiplies these.
    assert plan.count("from_json") == 4, plan
    assert plan.count("get_json_object") == 1, plan


def test_once_barrier_is_identity(spark):
    """shuffle(array(col))[0] must be the identity for every type it wraps
    (string, struct, map, null)."""
    from pyspark.sql import functions as F

    from fxa_amplitude_send_spark.operators.event_pipeline import _once

    df = spark.createDataFrame(
        [("a", 1), (None, 2)], "s string, i int"
    ).select(
        _once(F.col("s")).alias("s"),
        _once(F.struct("i", "s")).alias("st"),
        _once(F.create_map(F.lit("k"), F.col("s"))).alias("m"),
    )
    rows = sorted(df.collect(), key=lambda r: r.st.i)
    assert rows[0].s == "a" and rows[0].st.s == "a" and rows[0].m == {"k": "a"}
    assert rows[1].s is None and rows[1].m == {"k": None}
