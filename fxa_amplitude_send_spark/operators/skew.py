"""Skew-mitigation patterns (SURVEY.md §4.3): salting for hot keys.

AQE's skew-join splitting handles most runtime skew; these helpers cover the
cases AQE can't — aggregation skew (one giant group) and broadcast-infeasible
skewed joins — as API-level patterns, not planner changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: partial-aggregate spec: output_col -> (input_col, fn) with a merge fn
_MERGEABLE = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def _salt_col(cols: list[str], buckets: int) -> Column:
    """Deterministic salt: hash of the full row's non-key columns spreads a
    hot key across ``buckets`` reducers (deterministic → replayable)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs``: output_name -> (input_col, fn) with fn in sum/count/min/max
    (the mergeable subset). Phase 1 groups on (key, salt) — the hot key's
    rows split across ``salt_buckets`` reducers; phase 2 merges partials per
    key. Results are identical to a direct groupBy (these aggregates are
    associative+commutative), verified in tests.
    """
    for fn_name in (fn for _, fn in aggs.values()):
        if fn_name not in _MERGEABLE:
            raise ValueError(f"{fn_name!r} is not mergeable; use sum/count/min/max")

    value_cols = [c for c in df.columns if c not in key_cols]
    salted = df.withColumn("_salt", _salt_col(value_cols or key_cols, salt_buckets))

    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[
            getattr(F, _MERGEABLE[fn][0])(col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            getattr(F, _MERGEABLE[fn][1])(f"_p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is too large to
    broadcast: salt the skewed side deterministically, replicate the small
    side across every salt value (explode of a 0..n-1 sequence), join on
    (key, salt). Row multiplicity is preserved exactly — each skewed row
    joins the single replica carrying its salt."""
    value_cols = [c for c in skewed.columns if c != on]
    left = skewed.withColumn("_salt", _salt_col(value_cols or [on], salt_buckets))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = left.join(right, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def cap_basket(
    df: DataFrame,
    basket_key: str | list[str],
    order_cols: list[str],
    cap: int,
) -> DataFrame:
    """Bound basket size before a quadratic intra-basket operation
    (pair-generation self-joins: co-purchase, edge building).

    A self-join on a basket key fans out Σ basket_size² — fine when baskets
    are bounded (TPC-H orders hold ≤7 lines) but a single pathological
    basket (a null/default key aggregating millions of members in a real
    100 TB corpus) turns into one quadratic straggler task. This guard keeps
    at most ``cap`` members per basket, chosen DETERMINISTICALLY (the first
    ``cap`` under ``order_cols``, ties broken by every remaining orderable
    column so the ordering is total), so:

    - results are exactly unchanged whenever cap >= the true max basket size
      (property-tested), making a generous cap a pure safety net;
    - a hub basket contributes at most cap² pairs instead of size² — task
      time is bounded by the cap, not the skew;
    - the row_number window shuffles on the SAME key as the downstream
      self-join, so the exchange is reused — no extra shuffle in the plan.

    Deliberately a truncation, not a salt: intra-basket pair generation
    needs all pair partners co-located, so salting would have to replicate
    each bucket against every other (cap²/bucket² tasks) — heavier than
    capping and still quadratic in total. For baskets where the full
    quadratic output is genuinely wanted, raise the cap.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window
    from pyspark.sql.types import MapType

    keys = [basket_key] if isinstance(basket_key, str) else list(basket_key)
    # order_cols need not be a total order within a basket (duplicate
    # (basket, order) rows exist in real data), and row_number over a
    # partial order is partition-order dependent: WHICH tied row survives a
    # binding cap could differ run-to-run. Append every remaining orderable
    # column as a uniquifier so the window ordering is total over distinct
    # rows; fully-identical duplicates are interchangeable, so the result
    # set is deterministic either way. (Map columns are not orderable in
    # Spark and are skipped — ties then break on all other columns.)
    tie_breakers = [
        f.name
        for f in df.schema.fields
        if f.name not in keys
        and f.name not in order_cols
        and not isinstance(f.dataType, MapType)
    ]
    w = Window.partitionBy(*keys).orderBy(*order_cols, *tie_breakers)
    return (
        df.withColumn("_basket_rn", F.row_number().over(w))
        .filter(F.col("_basket_rn") <= cap)
        .drop("_basket_rn")
    )
