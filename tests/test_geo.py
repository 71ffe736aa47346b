"""Geo operators (operators/geo.py): grid join == brute force, plan shape
(equi-join on cell keys, never a cartesian), deterministic ties, haversine
sanity against known distances."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fxa_amplitude_send_spark.operators.geo import (
    grid_distance_join,
    haversine_km,
    nearest_within,
)


def _pts(spark, rows, key, lat, lon):
    return spark.createDataFrame(
        [Row(**{key: k, lat: la, lon: lo}) for k, la, lo in rows]
    ).select(F.col(key), F.col(lat).cast("long"), F.col(lon).cast("long"))


def test_grid_join_equals_brute_force(spark):
    import random

    rng = random.Random(7)
    a_rows = [(i, rng.randrange(-(10**7), 10**7), rng.randrange(-(10**7), 10**7))
              for i in range(300)]
    b_rows = [(j, rng.randrange(-(10**7), 10**7), rng.randrange(-(10**7), 10**7))
              for j in range(80)]
    r = 2_000_000
    a = _pts(spark, a_rows, "ak", "alat", "alon")
    b = _pts(spark, b_rows, "bk", "blat", "blon")
    got = sorted(
        (row.ak, row.bk)
        for row in grid_distance_join(
            a, b, r, a_lat="alat", a_lon="alon", b_lat="blat", b_lon="blon"
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, la, lo in a_rows
        for j, lb, lob in b_rows
        if (la - lb) ** 2 + (lo - lob) ** 2 <= r * r
    )
    assert got == want and len(want) > 0


def test_grid_join_refuses_column_overlap(spark):
    a = _pts(spark, [(1, 0, 0)], "k", "lat", "lon")
    b = _pts(spark, [(2, 0, 0)], "k2", "lat", "lon")
    with pytest.raises(ValueError, match="disjoint"):
        grid_distance_join(a, b, 1000)


def test_grid_join_is_equi_join_not_cartesian(spark):
    a = _pts(spark, [(i, i * 1000, 0) for i in range(50)], "ak", "alat", "alon")
    b = _pts(spark, [(j, j * 1000, 500) for j in range(50)], "bk", "blat", "blon")
    df = grid_distance_join(
        a, b, 10_000, a_lat="alat", a_lon="alon", b_lat="blat", b_lon="blon"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nearest_ties_break_on_smaller_key(spark):
    a = _pts(spark, [(1, 0, 0)], "ak", "alat", "alon")
    # two b-points equidistant from a
    b = _pts(spark, [(9, 0, 100), (3, 0, -100), (5, 0, 200)], "bk", "blat", "blon")
    out = nearest_within(
        a, b, 1_000, a_key="ak", b_key="bk",
        a_lat="alat", a_lon="alon", b_lat="blat", b_lon="blon",
    ).collect()
    assert len(out) == 1 and out[0].bk == 3 and out[0].dist2 == 100 * 100


def test_nearest_excludes_out_of_range(spark):
    a = _pts(spark, [(1, 0, 0), (2, 50_000_000, 0)], "ak", "alat", "alon")
    b = _pts(spark, [(7, 0, 500)], "bk", "blat", "blon")
    out = nearest_within(
        a, b, 1_000, a_key="ak", b_key="bk",
        a_lat="alat", a_lon="alon", b_lat="blat", b_lon="blon",
    ).collect()
    assert [r.ak for r in out] == [1]


def test_haversine_known_distances(spark):
    # one degree of latitude ~ 111.19 km; Paris->London ~ 343.5 km
    df = spark.createDataFrame(
        [
            Row(la=0, lo=0, lb=1_000_000, lob=0, want=111.19, tol=0.1),
            Row(
                la=48_856_600, lo=2_352_200,     # Paris
                lb=51_507_400, lob=-127_800,     # London
                want=343.5, tol=1.5,
            ),
        ]
    )
    got = df.select(
        "want",
        "tol",
        haversine_km(F.col("la"), F.col("lo"), F.col("lb"), F.col("lob")).alias(
            "km"
        ),
    ).collect()
    for r in got:
        assert math.isclose(r.km, r.want, abs_tol=r.tol), (r.km, r.want)


def test_haversine_agrees_with_planar_gate_metric_locally(spark):
    """Near the equator and at small separations, ordering by haversine and
    ordering by the planar gate metric agree — the gate metric is a faithful
    local proxy."""
    import random

    rng = random.Random(3)
    rows = [
        Row(k=i, la=rng.randrange(-(10**6), 10**6),
            lo=rng.randrange(-(10**6), 10**6))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    pairs = (
        df.alias("x")
        .join(df.alias("y"), F.col("x.k") < F.col("y.k"))
        .select(
            haversine_km(
                F.col("x.la"), F.col("x.lo"), F.col("y.la"), F.col("y.lo")
            ).alias("hav"),
            (
                (F.col("x.la") - F.col("y.la")) ** 2
                + (F.col("x.lo") - F.col("y.lo")) ** 2
            ).alias("d2"),
        )
        .collect()
    )
    by_hav = sorted(range(len(pairs)), key=lambda i: pairs[i].hav)
    by_d2 = sorted(range(len(pairs)), key=lambda i: pairs[i].d2)
    # rank correlation, not equality: lat/lon scale differently off-equator
    agree = sum(1 for a_, b_ in zip(by_hav, by_d2) if a_ == b_)
    assert agree / len(pairs) > 0.9


def test_wrap_lon_finds_cross_meridian_pair(spark):
    """A pair straddling ±180° is ~360° apart planar but 1 000 µ° apart on
    the sphere's lon axis: wrap_lon must find it, measure the SHORT way
    around, and the planar default must (by design) not see it."""
    a = _pts(spark, [(1, 0, 179_999_500)], "a_key", "a_lat", "a_lon")
    b = _pts(spark, [(7, 0, -179_999_500)], "b_key", "b_lat", "b_lon")
    radius = 2_000  # divides 360e6

    planar = grid_distance_join(
        a, b, radius, "a_lat", "a_lon", "b_lat", "b_lon"
    )
    assert planar.count() == 0

    wrapped = grid_distance_join(
        a, b, radius, "a_lat", "a_lon", "b_lat", "b_lon", wrap_lon=True
    ).collect()
    assert len(wrapped) == 1
    assert wrapped[0]["dist2"] == 1_000 * 1_000  # short-way Δlon = 1000


def test_wrap_lon_nearest_prefers_cross_meridian_neighbor(spark):
    """nearest_within under wrap_lon ranks by the wrapped metric: the
    across-the-seam neighbor (1 000 µ° away) beats the same-side one
    (1 500 µ° away)."""
    a = _pts(spark, [(1, 0, 179_999_500)], "a_key", "a_lat", "a_lon")
    b = _pts(
        spark,
        [(5, 0, 179_998_000), (7, 0, -179_999_500)],
        "b_key",
        "b_lat",
        "b_lon",
    )
    got = nearest_within(
        a, b, 2_000, "a_key", "b_key", "a_lat", "a_lon", "b_lat", "b_lon",
        wrap_lon=True,
    ).collect()
    assert len(got) == 1
    assert got[0]["b_key"] == 7 and got[0]["dist2"] == 1_000_000


def test_wrap_lon_matches_brute_force_near_seam(spark):
    """Randomized points clustered around ±180°: wrap join == brute force
    under the wrapped metric (the same oracle discipline as the planar
    grid-join test, shifted onto the seam)."""
    import random

    rng = random.Random(11)
    L = 360_000_000

    def seam_lon():
        # within ±50 000 µ° of the antimeridian, either sign
        d = rng.randrange(-50_000, 50_000)
        lon = 180_000_000 + d
        return lon - L if lon >= 180_000_000 else lon

    a_rows = [(i, rng.randrange(-(10**5), 10**5), seam_lon()) for i in range(60)]
    b_rows = [(j, rng.randrange(-(10**5), 10**5), seam_lon()) for j in range(60)]
    radius = 20_000  # divides 360e6
    a = _pts(spark, a_rows, "a_key", "a_lat", "a_lon")
    b = _pts(spark, b_rows, "b_key", "b_lat", "b_lon")
    got = {
        (r["a_key"], r["b_key"], r["dist2"])
        for r in grid_distance_join(
            a, b, radius, "a_lat", "a_lon", "b_lat", "b_lon", wrap_lon=True
        ).collect()
    }
    want = set()
    for i, la, lo in a_rows:
        for j, lb, lo2 in b_rows:
            raw = abs((lo % L) - (lo2 % L))
            dlon = min(raw, L - raw)
            d2 = (la - lb) ** 2 + dlon**2
            if d2 <= radius * radius:
                want.add((i, j, d2))
    assert got == want


def test_wrap_lon_refuses_non_dividing_radius(spark):
    a = _pts(spark, [(1, 0, 0)], "a_key", "a_lat", "a_lon")
    b = _pts(spark, [(2, 0, 0)], "b_key", "b_lat", "b_lon")
    with pytest.raises(ValueError, match="dividing"):
        grid_distance_join(
            a, b, 7, "a_lat", "a_lon", "b_lat", "b_lon", wrap_lon=True
        )
