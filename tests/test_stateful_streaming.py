"""applyInPandasWithState: per-key state must accumulate ACROSS micro-batches
and the final emitted totals must equal the batch groupBy on the same data."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from fxa_amplitude_send_spark.sources import load_table
from fxa_amplitude_send_spark.streaming.stateful import running_user_totals


def test_state_accumulates_across_batches(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events").select("user_id", "value", "event_id")
    pdf = ev.toPandas()

    src = tmp_path / "in"
    src.mkdir()
    files = 3
    per = (len(pdf) + files - 1) // files
    for i in range(files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        with open(src / f"part-{i}.json", "w") as fh:
            for _, row in chunk.iterrows():
                fh.write(
                    json.dumps(
                        {
                            "user_id": int(row.user_id),
                            "value": float(row.value),
                            "event_id": int(row.event_id),
                        }
                    )
                    + "\n"
                )

    stream = (
        spark.readStream.format("json")
        .schema("user_id long, value double, event_id long")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # the LAST update per user carries the accumulated totals
    updates = spark.sql("SELECT * FROM state_out")
    final = (
        updates.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .collect()
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4)) for r in final}

    expected_rows = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    expected = {r["user_id"]: (r["n"], round(r["t"], 4)) for r in expected_rows}
    assert got == expected

    # state really crossed batch boundaries: some user must appear in >1 batch
    multi = updates.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0
