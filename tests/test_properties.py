"""Property-based and randomized-model tests.

Pure-Python properties (hypothesis, many examples): the JS-coercion contract
behind HMAC parity. Spark operators (seeded random models, one batch per
run): as-of join vs an O(n²) brute-force model.
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from fxa_amplitude_send_spark.functions.hashing import (
    hmac_sha256_py,
    js_string_coerce,
)

scalars = st.one_of(
    st.none(),
    st.text(max_size=20),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=True, allow_infinity=False, width=64),
    st.booleans(),
)


class TestCoercionProperties:
    @given(scalars)
    @settings(max_examples=300, deadline=None)
    def test_falsy_iff_skipped(self, v):
        """coerce(v) is None exactly when JS `if (v)` is false (for our
        supported scalar types)."""
        js_falsy = (
            v is None
            or v == ""
            or v == 0
            or (isinstance(v, float) and (v == 0.0 or math.isnan(v)))
            or v is False
        )
        assert (js_string_coerce(v) is None) == js_falsy

    @given(st.floats(allow_nan=False, allow_infinity=False, width=64))
    @settings(max_examples=300, deadline=None)
    def test_float_coercion_roundtrips(self, f):
        """Non-falsy float coercion must round-trip to the same double
        (shortest-repr contract shared with JS Number→String)."""
        c = js_string_coerce(f)
        if c is not None:
            assert float(c) == f
            # integral floats render without a decimal point (String(5.0)='5')
            if f.is_integer() and abs(f) < 1e21:
                assert "." not in c and "e" not in c.lower()

    @given(st.lists(scalars, max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_hash_equals_manual_model(self, props):
        """hmac_sha256_py == HMAC over the concat of non-skipped coercions."""
        import hashlib
        import hmac as hm

        concat = "".join(
            c for c in (js_string_coerce(p) for p in props) if c is not None
        )
        expected = hm.new(b"test-key", concat.encode(), hashlib.sha256).hexdigest()
        assert hmac_sha256_py("test-key", *props) == expected

    @given(st.lists(scalars, min_size=1, max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_falsy_args_never_change_digest(self, props):
        assert hmac_sha256_py("k", *props) == hmac_sha256_py(
            "k", None, *props, "", 0
        )


class TestAsofJoinModel:
    def test_random_frames_match_bruteforce(self, spark):
        """as-of join vs the O(n²) definition on seeded random data: for each
        left row, asof_ts == max right.ts with same key and ts <= left.ts."""
        from fxa_amplitude_send_spark.operators.joins import asof_join

        rng = random.Random(1234)
        base = datetime(2024, 1, 1)

        def frame(n):
            return [
                (rng.randrange(8), base + timedelta(seconds=rng.randrange(10000)))
                for _ in range(n)
            ]

        left_rows = [(k, ts, i) for i, (k, ts) in enumerate(frame(120))]
        right_rows = [(k, ts, float(i)) for i, (k, ts) in enumerate(frame(150))]

        left = spark.createDataFrame(left_rows, "k int, ts timestamp, lid long")
        right = spark.createDataFrame(right_rows, "k int, ts timestamp, price double")
        got = {
            r["lid"]: r["asof_ts"]
            for r in asof_join(left, right, on="k", right_value_cols=("price",)).collect()
        }

        for k, ts, lid in left_rows:
            candidates = [rts for rk, rts, _ in right_rows if rk == k and rts <= ts]
            expected = max(candidates) if candidates else None
            assert got[lid] == expected, f"lid={lid}"

    def test_salted_join_random(self, spark):
        from fxa_amplitude_send_spark.operators.skew import salted_join

        rng = random.Random(99)
        # heavily skewed: 80% of rows share one key
        skewed_rows = [
            (0 if rng.random() < 0.8 else rng.randrange(10), i) for i in range(500)
        ]
        small_rows = [(k, f"v{k}") for k in range(10)]
        skewed = spark.createDataFrame(skewed_rows, "k int, rowid long")
        small = spark.createDataFrame(small_rows, "k int, val string")
        plain = skewed.join(small, "k").collect()
        salted = salted_join(skewed, small, on="k", salt_buckets=8).collect()
        assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


class TestNearestAsofModel:
    def test_random_nearest_matches_bruteforce(self, spark):
        """nearest as-of vs the O(n²) definition on seeded random data: the
        chosen right row minimizes |Δt|, ties break to at-or-before."""
        from fxa_amplitude_send_spark.operators.joins import asof_join

        rng = random.Random(4321)
        base = datetime(2024, 1, 1)

        def frame(n):
            return [
                (rng.randrange(6), base + timedelta(seconds=rng.randrange(5000)))
                for _ in range(n)
            ]

        left_rows = [(k, ts, i) for i, (k, ts) in enumerate(frame(100))]
        right_rows = [(k, ts) for k, ts in frame(130)]

        left = spark.createDataFrame(left_rows, "k int, ts timestamp, lid long")
        right = spark.createDataFrame(right_rows, "k int, ts timestamp")
        got = {
            r["lid"]: r["asof_ts"]
            for r in asof_join(
                left, right, on="k", direction="nearest"
            ).collect()
        }
        for k, ts, lid in left_rows:
            cands = [rts for rk, rts in right_rows if rk == k]
            if not cands:
                assert got[lid] is None
                continue
            best = min(cands, key=lambda rts: (abs(rts - ts), rts > ts))
            assert got[lid] == best, f"lid={lid}"


class TestIntervalMergeModel:
    def test_random_intervals_merge_exactly(self, spark):
        """Windowed gaps-and-islands interval merge vs a sequential sweep
        model: same islands, disjoint output, identical covered union."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rng = random.Random(777)
        rows = []
        for _ in range(200):
            k = rng.randrange(5)
            s = rng.randrange(1000)
            rows.append((k, s, s + rng.randrange(1, 40)))
        df = spark.createDataFrame(rows, "k int, s long, e long")

        w = Window.partitionBy("k").orderBy("s", "e")
        marked = df.withColumn(
            "is_new",
            F.when(
                F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
                >= F.col("s"),
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        merged = (
            marked.withColumn(
                "island",
                F.sum("is_new").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("k", "island")
            .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
            .collect()
        )
        got = {}
        for r in merged:
            got.setdefault(r["k"], []).append((r["ms"], r["me"]))

        # sequential sweep model
        expected = {}
        for k in {r[0] for r in rows}:
            ivs = sorted((s, e) for kk, s, e in rows if kk == k)
            out = []
            for s, e in ivs:
                if out and s <= out[-1][1]:
                    out[-1] = (out[-1][0], max(out[-1][1], e))
                else:
                    out.append((s, e))
            expected[k] = out
        for k in expected:
            assert sorted(got[k]) == expected[k], f"key {k}"
            spans = sorted(got[k])
            assert all(a[1] < b[0] for a, b in zip(spans, spans[1:])), "overlap"
