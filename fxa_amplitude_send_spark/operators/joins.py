"""Temporal join operators Spark lacks as builtins, composed from existing
DataFrame ops (SURVEY.md §2B custom-operator policy: composition first,
Pandas UDF only if semantics demand it — here they don't).

as-of join: for each left row, the latest right row with right.ts <= left.ts
within the same key. Implemented with the union + windowed
last_value(ignorenulls) pattern: one shuffle on (key), one sort per
partition — the same cost profile as a sort-merge join, and immune to key
skew beyond what the window partitioning already implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: tuple[str, ...] = (),
    direction: str = "backward",
) -> DataFrame:
    """For each left row: the most recent right row at-or-before its
    timestamp (direction='backward'), or the earliest right row at-or-after
    it (direction='forward'), per key ``on``.

    Output: all left columns + ``asof_ts`` + the requested right value
    columns (null when no matching right row exists in the direction).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_ts, right_ts, right_value_cols)

    # Left rows sort AFTER right rows at equal timestamps for backward
    # (right 0 < left 1 → at-or-before sees same-instant rights) and BEFORE
    # them for forward (left 0 < right 1 → at-or-after sees same-instant
    # rights). The fill then looks in the matching frame direction.
    left_tag, right_tag = (1, 0) if direction == "backward" else (0, 1)
    rt_type = right.schema[right_ts].dataType
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(left_tag).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(rt_type).alias("_rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(right_tag).alias("_side"),
        F.lit(None).cast(tagged_left.schema["_l"].dataType).alias("_l"),
        F.col(right_ts).alias("_rt"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = Window.partitionBy("_k").orderBy("_t", "_side")
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    filled = unioned.select(
        "_side",
        "_l",
        fill("_rt").over(w).alias("asof_ts"),
        *[
            fill(f"_rv_{c}").over(w).alias(f"_filled_{c}")
            for c in right_value_cols
        ],
    )
    out = filled.filter(F.col("_side") == left_tag).select(
        "_l.*",
        "asof_ts",
        *[F.col(f"_filled_{c}").alias(f"asof_{c}") for c in right_value_cols],
    )
    return out


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: tuple[str, ...],
) -> DataFrame:
    """Nearest as-of: per left row, the right row minimizing |right.ts -
    left.ts| within the key; ties break BACKWARD (at-or-before wins).

    Both directional fills run over the SAME union and the same
    (key, ts, side) sort — one shuffle, two window frames. Left rows use the
    backward tag order (after same-instant rights), so an equal-timestamp
    right is invisible to the forward frame — harmless, because backward
    already sees it at distance 0, which is the guaranteed minimum and wins
    the tie anyway."""
    left_tag = 1
    rt_type = right.schema[right_ts].dataType
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(left_tag).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(rt_type).alias("_rt"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
            for c in right_value_cols
        ],
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(tagged_left.schema["_l"].dataType).alias("_l"),
        F.col(right_ts).alias("_rt"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    base = Window.partitionBy("_k").orderBy("_t", "_side")
    back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    filled = unioned.select(
        "_side",
        "_t",
        "_l",
        F.last("_rt", ignorenulls=True).over(back).alias("_bt"),
        F.first("_rt", ignorenulls=True).over(fwd).alias("_ft"),
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(back).alias(f"_bv_{c}")
            for c in right_value_cols
        ],
        *[
            F.first(f"_rv_{c}", ignorenulls=True).over(fwd).alias(f"_fv_{c}")
            for c in right_value_cols
        ],
    )
    # backward wins when forward is absent, or backward exists and is at
    # least as close (ties -> backward).
    # Timestamp subtraction yields a day-time interval; interval comparison
    # is exact and timezone-free (works for TIMESTAMP and TIMESTAMP_NTZ).
    take_back = F.col("_ft").isNull() | (
        F.col("_bt").isNotNull()
        & ((F.col("_t") - F.col("_bt")) <= (F.col("_ft") - F.col("_t")))
    )
    return filled.filter(F.col("_side") == left_tag).select(
        "_l.*",
        F.when(take_back, F.col("_bt")).otherwise(F.col("_ft")).alias("asof_ts"),
        *[
            F.when(take_back, F.col(f"_bv_{c}"))
            .otherwise(F.col(f"_fv_{c}"))
            .alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
