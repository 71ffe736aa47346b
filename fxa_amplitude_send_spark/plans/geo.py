"""Geospatial gate queries over operators/geo.py.

The tables carry no coordinates, so each entity gets a DETERMINISTIC
synthetic position derived from its key via the portable 52-bit md5 fold
(q_theta_sketch's trick: Spark ``conv(substr(md5(k),1,13),16,10)`` and a
DuckDB hex-digit fold produce the same BIGINT), mapped into integer
micro-degrees. Both engines derive identical coordinates from first
principles, so the whole pipeline — derivation, grid bucketing, exact
BIGINT distance predicate — is hash-gated end to end.

The gate metric is squared planar distance (BIGINT-exact); the spherical
haversine lives in operators/geo.py under pytest. Longitude wraparound at
the antimeridian is planar in q_geo_join / q_geo_nearest (both engines
apply the same predicate) and FULLY MODELED in q_geo_nearest_wrap, whose
shorter-way-around Δlon is still integer-exact — so even the seam
behavior is hash-gated, not just pytest-covered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_LAT_SPAN = 120_000_001   # micro-degrees in [-60e6, 60e6]
_LON_SPAN = 360_000_001   # micro-degrees in [-180e6, 180e6]


def _micro(col: Column, salt: str, span: int) -> Column:
    """Deterministic micro-degree coordinate from a key: 52 exact md5 bits
    folded mod span, centered. Matches _micro_sql digit-for-digit."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 13
            ),
            16,
            10,
        )
        .cast("long")
    )
    return (h % F.lit(span)) - F.lit(span // 2)


def _micro_sql(key: str, salt: str, span: int) -> str:
    fold = (
        "list_reduce(list_transform(range(1, 14), j -> CAST(strpos("
        f"'0123456789abcdef', substr(md5('{salt}:' || CAST({key} AS VARCHAR)),"
        " CAST(j AS INTEGER), 1)) - 1 AS BIGINT)), (acc, d) -> acc * 16 + d)"
    )
    return f"({fold} % {span} - {span // 2})"


def _customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        _micro(F.col("c_custkey"), "lat", _LAT_SPAN).alias("lat"),
        _micro(F.col("c_custkey"), "lon", _LON_SPAN).alias("lon"),
    )


def _suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        _micro(F.col("s_suppkey"), "slat", _LAT_SPAN).alias("slat"),
        _micro(F.col("s_suppkey"), "slon", _LON_SPAN).alias("slon"),
    )


_GEO_CTE = f"""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             {_micro_sql('c_custkey', 'lat', _LAT_SPAN)} AS lat,
             {_micro_sql('c_custkey', 'lon', _LON_SPAN)} AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_micro_sql('s_suppkey', 'slat', _LAT_SPAN)} AS lat,
             {_micro_sql('s_suppkey', 'slon', _LON_SPAN)} AS lon
      FROM supplier
    )
"""


@query(
    "q_geo_join",
    oracle=_GEO_CTE
    + """
    , pairs AS (
      SELECT c.c_nationkey, s.s_suppkey,
             (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon) AS dist2
      FROM c, s
      WHERE (c.lat - s.lat) * (c.lat - s.lat)
            + (c.lon - s.lon) * (c.lon - s.lon)
            <= CAST(3000000 AS BIGINT) * 3000000
    )
    SELECT c_nationkey, COUNT(*) AS n_pairs,
           COUNT(DISTINCT s_suppkey) AS n_suppliers,
           MIN(dist2) AS min_dist2
    FROM pairs GROUP BY c_nationkey
    """,
)
def q_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance join under the correctness gate (operators/geo.py
    grid_distance_join): every (customer, supplier) pair within 3° planar
    radius, grid-bucketed — the supplier side explodes into its 3×3 cell
    neighborhood and equi-joins the customer side's cell, so the oracle's
    quadratic cross-join predicate becomes a co-located shuffle join with
    O(local density) comparisons. Aggregated per customer nation on exact
    BIGINTs.

    Scale posture: at 100 TB the cell key is the shuffle key — density,
    not table size, bounds per-task work; the 9× explode rides the small
    side. The ORACLE is the quadratic formulation (DuckDB cross join);
    the engine plan never is — same discipline as the dedup family."""
    from ..operators.geo import grid_distance_join

    r = 3_000_000
    pairs = grid_distance_join(
        _customers(spark, sf_dir), _suppliers(spark, sf_dir), r,
        b_lat="slat", b_lon="slon",
    )
    return pairs.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
        F.min("dist2").alias("min_dist2"),
    )


@query(
    "q_geo_nearest",
    oracle=_GEO_CTE
    + """
    , pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon) AS dist2
      FROM c, s
      WHERE (c.lat - s.lat) * (c.lat - s.lat)
            + (c.lon - s.lon) * (c.lon - s.lon)
            <= CAST(10000000 AS BIGINT) * 10000000
    ), ranked AS (
      SELECT c_custkey, s_suppkey, dist2,
             ROW_NUMBER() OVER (
               PARTITION BY c_custkey ORDER BY dist2, s_suppkey
             ) AS rn
      FROM pairs
    )
    SELECT c_custkey, s_suppkey, dist2 FROM ranked WHERE rn = 1
    """,
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-within-radius under the correctness gate
    (operators/geo.py nearest_within): each customer's closest supplier
    inside 10° planar radius, ties broken on the smaller supplier key so
    the answer is total-order deterministic. Engine plan: grid candidate
    join + ONE row_number window partitioned by customer; the oracle ranks
    the quadratic pair set. Customers with no supplier in range are absent
    from both sides by construction."""
    from ..operators.geo import nearest_within

    out = nearest_within(
        _customers(spark, sf_dir),
        _suppliers(spark, sf_dir),
        10_000_000,
        a_key="c_custkey",
        b_key="s_suppkey",
        b_lat="slat",
        b_lon="slon",
    )
    return out.select("c_custkey", "s_suppkey", "dist2")


@query(
    "q_geo_nearest_wrap",
    oracle=_GEO_CTE
    + """
    , pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.lat - s.lat) * (c.lat - s.lat)
             + LEAST(ABS(c.lon - s.lon) % 360000000,
                     360000000 - (ABS(c.lon - s.lon) % 360000000))
               * LEAST(ABS(c.lon - s.lon) % 360000000,
                       360000000 - (ABS(c.lon - s.lon) % 360000000)) AS dist2
      FROM c, s
    )
    SELECT c_custkey, s_suppkey, dist2 FROM (
      SELECT c_custkey, s_suppkey, dist2,
             ROW_NUMBER() OVER (
               PARTITION BY c_custkey ORDER BY dist2, s_suppkey
             ) AS rn
      FROM pairs
      WHERE dist2 <= CAST(10000000 AS BIGINT) * 10000000
    ) WHERE rn = 1
    """,
)
def q_geo_nearest_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANTIMERIDIAN-aware nearest neighbor under the correctness gate
    (operators/geo.py nearest_within wrap_lon=True, round-7 verdict item
    7): longitudes normalize to [0, 360e6), candidate lon cells wrap
    modulo the cell count, and Δlon takes the SHORTER way around the
    circle — so a customer at lon 179.9° finds a supplier at −179.9°
    where the planar q_geo_nearest cannot. The wrapped metric is still
    squared-integer-exact (min of two BIGINT candidates), which is what
    lets DuckDB replay it verbatim: the oracle's Δlon is
    LEAST(|Δ| mod 360e6, 360e6 − |Δ| mod 360e6) over the identical
    md5-derived coordinates, ranked by the identical
    (dist2, supplier-key) order. Radius 10e6 µ° divides the circle
    evenly — the precondition wrap-join completeness needs (equal-width
    cells; refused loudly otherwise, pytest-pinned).

    Scale posture identical to q_geo_nearest: grid cells are the shuffle
    key, the 3×3 neighborhood explode rides the small side, per-task work
    is O(local density) — the modulo on the cell key changes candidate
    GENERATION, never the join shape."""
    from ..operators.geo import nearest_within

    out = nearest_within(
        _customers(spark, sf_dir),
        _suppliers(spark, sf_dir),
        10_000_000,
        a_key="c_custkey",
        b_key="s_suppkey",
        b_lat="slat",
        b_lon="slon",
        wrap_lon=True,
    )
    return out.select("c_custkey", "s_suppkey", "dist2")


@query(
    "q_geo_haversine",
    oracle=_GEO_CTE
    + """
    , pairs AS (
      SELECT c.c_nationkey,
             CAST(ROUND(2 * 6371.0088 * ASIN(SQRT(
               POW(SIN((RADIANS(s.lat / 1000000.0)
                        - RADIANS(c.lat / 1000000.0)) / 2), 2)
               + COS(RADIANS(c.lat / 1000000.0))
                 * COS(RADIANS(s.lat / 1000000.0))
                 * POW(SIN((RADIANS(s.lon / 1000000.0)
                            - RADIANS(c.lon / 1000000.0)) / 2), 2)
             )) * 1000) AS BIGINT) AS dist_m
      FROM c, s
      WHERE (c.lat - s.lat) * (c.lat - s.lat)
            + (c.lon - s.lon) * (c.lon - s.lon)
            <= CAST(3000000 AS BIGINT) * 3000000
    )
    SELECT c_nationkey, COUNT(*) AS n_pairs,
           CAST(SUM(dist_m) AS BIGINT) AS sum_dist_m,
           MIN(dist_m) AS min_dist_m
    FROM pairs GROUP BY c_nationkey
    """,
)
def q_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SPHERICAL metric itself under the correctness gate (round-8
    verdict item 7): haversine_km (operators/geo.py — the production path,
    previously pytest-only) over a pair set whose MEMBERSHIP is decided by
    the BIGINT-exact planar predicate (q_geo_join's 3° grid join), so both
    engines agree on exactly which pairs exist with zero float risk; each
    pair's great-circle distance is then snapped to an integer METER grid
    (round(km*1000)) before aggregation, so the only engine-specific float
    work is absorbed by ~10 orders of magnitude of snap headroom (libm vs
    JVM transcendentals differ at ~1e-15 relative; the snap boundary is
    0.5 m on ~100 km values). The oracle replays the identical formula —
    same association order, same half-up rounding — over the identical
    md5-derived coordinates. Integer sums/mins after the snap are exact.

    In production the grid radius would be sized from the km radius via
    the worst-case degree-per-km at the latitude band; here the planar
    3e6 µ° neighborhood IS the spec (pairs near enough to care about,
    measured spherically). Scale posture = q_geo_join: cell-key shuffle,
    O(local density), the 9x explode rides the supplier side."""
    from ..operators.geo import grid_distance_join, haversine_km

    pairs = grid_distance_join(
        _customers(spark, sf_dir), _suppliers(spark, sf_dir), 3_000_000,
        b_lat="slat", b_lon="slon",
    )
    dist_m = (
        F.round(
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon")
            )
            * 1000
        )
        .cast("long")
        .alias("dist_m")
    )
    return (
        pairs.select("c_nationkey", dist_m)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("dist_m").alias("sum_dist_m"),
            F.min("dist_m").alias("min_dist_m"),
        )
    )
