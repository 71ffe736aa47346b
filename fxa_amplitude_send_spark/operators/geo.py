"""Geospatial distance operators — grid-bucketed, never all-pairs.

The scale pattern is the same one the dedup family uses
(operators/dedup.py): turn a pairwise predicate into an EQUI-JOIN on a
derived key. For "within radius r", the derived key is the r-sized grid
cell of each point; a qualifying pair's cells differ by at most 1 in each
axis, so joining one side against its 3×3 cell neighborhood yields a
candidate superset, and the exact distance predicate keeps only true
matches. Cost is O(Σ_cell |A_cell| · |B_cell_neighborhood|) — local
density, not |A|·|B|; Spark shuffles both sides once on the cell key and
every comparison is co-located.

Coordinates are INTEGER micro-degrees and the gate predicate is squared
Euclidean distance on BIGINTs — exact in any engine, which is what lets
the driver hash-match a DuckDB oracle (the repo's integer-grid
discipline). ``haversine_km`` supplies the real spherical distance for
production use; its floats are engine-specific, so it is pytest-covered
(monotone agreement with the planar gate metric) rather than hash-gated.

The reference has no geo surface (it is a streaming ETL, utils.js) —
this extends the engine the same way the LLM operators do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cell_of(coord: Column, cell_size: int) -> Column:
    """r-sized grid cell index of an integer micro-degree coordinate.
    floor division, exact for |coord| < 2^53 (micro-degrees are ≤ 1.8e8)."""
    return F.floor(coord / F.lit(int(cell_size))).cast("long")


#: full longitude circle in micro-degrees
_LON_CIRCLE = 360_000_000


def dist2(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Squared planar distance in micro-degrees² — BIGINT-exact."""
    dlat = lat_a - lat_b
    dlon = lon_a - lon_b
    return (dlat * dlat + dlon * dlon).cast("long")


def _norm_lon(lon: Column) -> Column:
    """Longitude normalized to [0, 360e6) micro-degrees — BIGINT-exact."""
    c = F.lit(_LON_CIRCLE)
    return ((lon.cast("long") % c) + c) % c


def wrapped_dist2(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Squared planar distance with ANTIMERIDIAN wraparound on the lon
    axis: Δlon is the shorter way around the circle, so a pair straddling
    ±180° measures its true separation instead of ~360°. Still
    BIGINT-exact (min of two integer candidates)."""
    dlat = lat_a - lat_b
    raw = F.abs(_norm_lon(lon_a) - _norm_lon(lon_b))
    dlon = F.least(raw, F.lit(_LON_CIRCLE) - raw)
    return (dlat * dlat + dlon * dlon).cast("long")


def haversine_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in km from micro-degree coordinates (double)."""
    to_rad = lambda c: F.radians(c / F.lit(1_000_000.0))  # noqa: E731
    la, lb = to_rad(lat_a), to_rad(lat_b)
    dphi = (to_rad(lat_b) - to_rad(lat_a)) / 2
    dlmb = (to_rad(lon_b) - to_rad(lon_a)) / 2
    h = F.sin(dphi) ** 2 + F.cos(la) * F.cos(lb) * F.sin(dlmb) ** 2
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(h))


def grid_distance_join(
    a: DataFrame,
    b: DataFrame,
    radius: int,
    a_lat: str = "lat",
    a_lon: str = "lon",
    b_lat: str = "lat",
    b_lon: str = "lon",
    wrap_lon: bool = False,
) -> DataFrame:
    """All (a, b) pairs with planar distance ≤ ``radius`` micro-degrees.

    B is exploded into its 3×3 cell neighborhood (9× one side, typically
    the smaller) and equi-joined against A's cell — each qualifying pair
    matches in EXACTLY one (cell, offset) combination (a's cell is a
    function of a alone), so no dedup pass is needed. The exact predicate
    dist² ≤ r² runs on BIGINTs. Output: all columns of a and b, plus
    ``dist2``. Catalyst broadcasts the exploded side when it is small;
    otherwise both sides shuffle once on the cell key.

    ``wrap_lon=True`` models the ANTIMERIDIAN: longitudes normalize to
    [0, 360e6), candidate lon cells wrap modulo the cell count, and Δlon
    takes the shorter way around — so a pair straddling ±180° is found and
    measured correctly. Wraparound needs every lon cell exactly r wide
    (otherwise a narrow seam cell breaks the ±1-cell candidate guarantee),
    so the radius must divide 360e6 evenly — refused loudly otherwise.
    The default stays planar: the correctness gate's metric is plain
    BIGINT Euclidean so DuckDB can hash-match it."""
    overlap = set(a.columns) & set(b.columns)
    if overlap:
        raise ValueError(
            f"grid_distance_join needs disjoint column names; both sides "
            f"carry {sorted(overlap)} — alias one side first"
        )
    r = int(radius)
    if wrap_lon and _LON_CIRCLE % r:
        raise ValueError(
            f"wrap_lon needs a radius dividing {_LON_CIRCLE} micro-degrees "
            f"evenly (got {r}) — equal-width lon cells are what make the "
            "3x3 wrap-join candidate set complete"
        )
    n_lon_cells = _LON_CIRCLE // r if wrap_lon else None
    a_lon_col = _norm_lon(F.col(a_lon)) if wrap_lon else F.col(a_lon)
    b_lon_col = _norm_lon(F.col(b_lon)) if wrap_lon else F.col(b_lon)
    a2 = a.withColumn("_ga", cell_of(F.col(a_lat), r)).withColumn(
        "_go", cell_of(a_lon_col, r)
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    b_go = cell_of(b_lon_col, r) + F.col("_dlo")
    if wrap_lon:
        b_go = (b_go + F.lit(n_lon_cells)) % F.lit(n_lon_cells)
    b2 = (
        b.withColumn("_dla", F.explode(off))
        .withColumn("_dlo", F.explode(off))
        .withColumn("_ga", cell_of(F.col(b_lat), r) + F.col("_dla"))
        .withColumn("_go", b_go)
        .drop("_dla", "_dlo")
    )
    joined = a2.join(b2, ["_ga", "_go"]).drop("_ga", "_go")
    metric = wrapped_dist2 if wrap_lon else dist2
    d2 = metric(F.col(a_lat), F.col(a_lon), F.col(b_lat), F.col(b_lon))
    # r*r in Python: a lit(int)*lit(int) constant-folds as 32-bit under ANSI
    return joined.withColumn("dist2", d2).filter(F.col("dist2") <= F.lit(r * r))


def nearest_within(
    a: DataFrame,
    b: DataFrame,
    radius: int,
    a_key: str,
    b_key: str,
    a_lat: str = "lat",
    a_lon: str = "lon",
    b_lat: str = "lat",
    b_lon: str = "lon",
    wrap_lon: bool = False,
) -> DataFrame:
    """For each a-row, its NEAREST b-row within ``radius`` (a-rows with no
    candidate are absent — compose with a left join for left semantics).
    Ties break on the smallest b_key, so the result is total-order
    deterministic. One window over the candidate pairs; state per a-row is
    O(local density). ``wrap_lon=True`` ranks by the antimeridian-aware
    metric (see grid_distance_join), so a neighbor across ±180° beats a
    farther same-side one."""
    from pyspark.sql import Window

    pairs = grid_distance_join(
        a, b, radius, a_lat, a_lon, b_lat, b_lon, wrap_lon=wrap_lon
    )
    w = Window.partitionBy(a_key).orderBy(F.col("dist2").asc(), F.col(b_key).asc())
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
