"""Event-time windowed aggregations — usable identically on batch and
streaming DataFrames (the streaming path adds a watermark for state cleanup
and late-data tolerance, SURVEY.md §2B streaming table).

All builders return the same columns in batch and streaming mode, so the
batch run IS the oracle for the streaming run (test_streaming_windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Late-data bound: events older than max(event_time) - delay are dropped
    and window state below the watermark is evicted — the engine's version of
    tolerating Pub/Sub redelivery lag (synchronous-pull.js:84)."""
    return df.withWatermark(ts_col, delay)


def tumbling_metrics(
    df: DataFrame, ts_col: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """R12/R13 as a first-class operator: per tumbling window min/max/count —
    the reference's per-pull-batch metrics generalized to event time."""
    return (
        df.groupBy(F.window(ts_col, width).alias("win"))
        .agg(
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "min_ts",
            "max_ts",
            "n_events",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event counts; each event lands in width/slide windows."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def session_windows(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session windows per key (the semantics behind the
    reference's session_id field, utils.js:59-68, computed from event time).
    Window end = last event + gap (Spark session_window contract)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )
