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
    timestamp (direction='backward'), per key ``on``.

    Output: all left columns + ``asof_ts`` + the requested right value
    columns (null when no prior right row exists).
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")

    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast("timestamp").alias("_rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(tagged_left.schema["_l"].dataType).alias("_l"),
        F.col(right_ts).alias("_rt"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )
    # right rows sort BEFORE left rows at equal timestamps (_side 0 < 1), so
    # "at-or-before" includes same-instant right rows.
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_side",
        "_l",
        F.last("_rt", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_filled_{c}")
            for c in right_value_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).select(
        "_l.*",
        "asof_ts",
        *[F.col(f"_filled_{c}").alias(f"asof_{c}") for c in right_value_cols],
    )
    return out
