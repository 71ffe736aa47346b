"""Vector column math over ArrayType(Float/Double) embedding columns.

All JVM-side higher-order functions (transform/zip_with/aggregate) — no Python
in the hot path, so whole-stage codegen applies and these scale linearly with
the scan. Computation is done in double precision regardless of storage type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double precision)."""
    return F.aggregate(
        F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            as_double_array(a), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (l2_norm_col(a) * l2_norm_col(b))
