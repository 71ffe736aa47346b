"""Streaming windowed aggregations: the batch run IS the oracle — same
builder, same columns, watermark added on the stream side."""

from __future__ import annotations

import json

from fxa_amplitude_send_spark.sources import load_table
from fxa_amplitude_send_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_metrics,
    with_watermark,
)


def canon(rows):
    return sorted(tuple(r) for r in rows)


def _stream_events(spark, tmp_path, sf_dir):
    """events table → json lines in 3 files → file-source stream."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    pdf = ev.toPandas()
    files = 3
    per = (len(pdf) + files - 1) // files
    src = tmp_path / "in"
    src.mkdir()
    for i in range(files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        with open(src / f"part-{i}.json", "w") as fh:
            for _, row in chunk.iterrows():
                fh.write(
                    json.dumps(
                        {
                            "event_id": int(row.event_id),
                            "ts": row.ts.isoformat(),
                            "user_id": int(row.user_id),
                        }
                    )
                    + "\n"
                )
    return (
        spark.readStream.format("json")
        .schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )


def _run_to_memory(spark, df, name, tmp_path, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_equals_batch(spark, sf_smoke, tmp_path):
    batch = tumbling_metrics(
        load_table(spark, sf_smoke, "events"), ts_col="ts", width="1 hour"
    )
    stream = _stream_events(spark, tmp_path, sf_smoke)
    streamed = tumbling_metrics(with_watermark(stream, "ts", "0 seconds"), "ts", "1 hour")
    got = _run_to_memory(spark, streamed, "tumbling_out", tmp_path, mode="complete")
    assert canon(got.collect()) == canon(batch.collect())


def test_session_stream_equals_batch(spark, sf_smoke, tmp_path):
    batch = session_windows(
        load_table(spark, sf_smoke, "events"), key_col="user_id", gap="30 minutes"
    )
    stream = _stream_events(spark, tmp_path, sf_smoke)
    streamed = session_windows(
        with_watermark(stream, "ts", "0 seconds"), key_col="user_id", gap="30 minutes"
    )
    got = _run_to_memory(spark, streamed, "session_out", tmp_path, mode="complete")
    assert canon(got.collect()) == canon(batch.collect())


def test_sliding_stream_equals_batch(spark, sf_smoke, tmp_path):
    batch = sliding_counts(load_table(spark, sf_smoke, "events"))
    stream = _stream_events(spark, tmp_path, sf_smoke)
    streamed = sliding_counts(with_watermark(stream, "ts", "0 seconds"))
    got = _run_to_memory(spark, streamed, "sliding_out", tmp_path, mode="complete")
    assert canon(got.collect()) == canon(batch.collect())


def test_stream_stream_join_equals_batch(spark, sf_smoke, tmp_path):
    """Stream-stream interval join output must equal the batch range join."""
    import pyspark.sql.functions as F

    from fxa_amplitude_send_spark.streaming.pipeline import (
        stream_stream_interval_join,
    )

    ev = load_table(spark, sf_smoke, "events")
    batch_clicks = ev.filter(F.col("event_type") == "click")
    batch_purch = ev.filter(F.col("event_type") == "purchase")
    expected = (
        batch_clicks.alias("l")
        .join(
            batch_purch.alias("r"),
            F.expr(
                "l.user_id = r.user_id AND l.ts < r.ts "
                "AND r.ts <= l.ts + INTERVAL 10 MINUTES"
            ),
        )
        .select(F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b"))
    )

    stream = _stream_events_typed(spark, tmp_path, sf_smoke)
    clicks = stream.filter(F.col("event_type") == "click")
    purch = stream.filter(F.col("event_type") == "purchase")
    joined = stream_stream_interval_join(clicks, purch).select(
        F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM ssj_out")
    assert canon(got.collect()) == canon(expected.collect())


def _stream_events_typed(spark, tmp_path, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    pdf = ev.toPandas()
    src = tmp_path / "in_typed"
    src.mkdir()
    files = 2
    per = (len(pdf) + files - 1) // files
    for i in range(files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        with open(src / f"part-{i}.json", "w") as fh:
            for _, row in chunk.iterrows():
                fh.write(
                    json.dumps(
                        {
                            "event_id": int(row.event_id),
                            "ts": row.ts.isoformat(),
                            "user_id": int(row.user_id),
                            "event_type": row.event_type,
                        }
                    )
                    + "\n"
                )
    return (
        spark.readStream.format("json")
        .schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )


def test_stream_stream_left_outer_join_equals_batch(spark, sf_smoke, tmp_path):
    """Left-outer interval join: matched pairs AND null-padded unmatched
    left rows must equal the batch left join. Unmatched rows only emit once
    both watermarks pass their window, so the input is augmented with two
    far-future sentinel rows (one per side, unmatched user_ids) that push
    the watermarks past every real event."""
    import pyspark.sql.functions as F

    from fxa_amplitude_send_spark.streaming.pipeline import (
        stream_stream_interval_join,
    )

    ev = load_table(spark, sf_smoke, "events")
    batch_clicks = ev.filter(F.col("event_type") == "click")
    batch_purch = ev.filter(F.col("event_type") == "purchase")
    expected = (
        batch_clicks.alias("l")
        .join(
            batch_purch.alias("r"),
            F.expr(
                "l.user_id = r.user_id AND l.ts < r.ts "
                "AND r.ts <= l.ts + INTERVAL 10 MINUTES"
            ),
            "left_outer",
        )
        .select(F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b"))
    )

    # typed stream + far-future sentinels to advance both watermarks
    ev_sel = ev.select("event_id", "ts", "user_id", "event_type")
    pdf = ev_sel.toPandas()
    src = tmp_path / "in_outer"
    src.mkdir()
    files = 2
    per = (len(pdf) + files - 1) // files
    max_ts = pdf.ts.max()
    for i in range(files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        with open(src / f"part-{i}.json", "w") as fh:
            for _, row in chunk.iterrows():
                fh.write(
                    json.dumps(
                        {
                            "event_id": int(row.event_id),
                            "ts": row.ts.isoformat(),
                            "user_id": int(row.user_id),
                            "event_type": row.event_type,
                        }
                    )
                    + "\n"
                )
    import pandas as pd

    sentinel_ts = (max_ts + pd.Timedelta(days=30)).isoformat()
    with open(src / "part-zz-sentinel.json", "w") as fh:
        fh.write(
            json.dumps({"event_id": -1, "ts": sentinel_ts, "user_id": -1,
                        "event_type": "click"}) + "\n"
        )
        fh.write(
            json.dumps({"event_id": -2, "ts": sentinel_ts, "user_id": -2,
                        "event_type": "purchase"}) + "\n"
        )
    stream = (
        spark.readStream.format("json")
        .schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    clicks = stream.filter(F.col("event_type") == "click")
    purch = stream.filter(F.col("event_type") == "purchase")
    joined = stream_stream_interval_join(
        clicks, purch, watermark="1 minute", how="left_outer"
    ).select(F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM ssj_outer_out WHERE a >= 0")
    assert canon(got.collect()) == canon(expected.collect())
    # the outer join really added null-padded rows
    n_unmatched = got.filter(F.col("b").isNull()).count()
    assert n_unmatched > 0
