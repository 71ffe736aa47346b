"""Custom Python DataSource (payload_queue): batch read parity, streaming
rate-cap compliance (MAX_EVENTS_PER_BATCH analogue), and batch==stream
equivalence through the full event pipeline."""

from __future__ import annotations

import json
import math

import pyspark.sql.functions as F

from fxa_amplitude_send_spark.sources.queue_datasource import PayloadQueueDataSource


def _drain(spark, q, sink, n_rows, timeout=120.0):
    """Block until the memory sink holds n_rows (or fail), then stop."""
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        got = spark.sql(f"SELECT COUNT(*) AS c FROM {sink}").collect()[0]["c"]
        if got >= n_rows:
            q.stop()
            return
        time.sleep(0.5)
    q.stop()
    raise AssertionError(f"sink {sink} never reached {n_rows} rows")


def _write_queue(tmp_path, n_files=3, rows_per_file=40):
    src = tmp_path / "queue"
    src.mkdir()
    total = 0
    for i in range(n_files):
        with open(src / f"payloads-{i:03d}.jsonl", "w") as fh:
            for j in range(rows_per_file):
                fh.write(
                    json.dumps(
                        {"Fields": {"device_id": f"d-{i}-{j}", "event_type": "click",
                                    "time": 1000 + total, "session_id": total}}
                    )
                    + "\n"
                )
                total += 1
    return str(src), total


def test_batch_read_all_rows_with_stable_offsets(spark, tmp_path):
    path, total = _write_queue(tmp_path)
    spark.dataSource.register(PayloadQueueDataSource)
    df = spark.read.format("payload_queue").option("path", path).load()
    assert df.count() == total
    offs = [r["offset"] for r in df.select("offset").collect()]
    assert sorted(offs) == list(range(total))
    # payloads parse and carry the expected fields
    one = df.filter(F.col("offset") == 0).collect()[0]
    assert json.loads(one["payload"])["Fields"]["event_type"] == "click"


def test_stream_reader_cursor_resyncs_after_restart(tmp_path):
    """A restarted stream reader is a fresh instance with cursor 0, but
    Spark replays the checkpointed range via partitions(start, end) before
    asking for new offsets — the cursor must re-sync from those offsets so
    latestOffset() never returns an offset BEHIND the offset log (which
    would re-emit rows already committed, beyond the documented
    uncommitted-tail replay)."""
    from fxa_amplitude_send_spark.sources.queue_datasource import (
        _QueueStreamReader,
    )

    path, total = _write_queue(tmp_path, n_files=3, rows_per_file=40)
    r = _QueueStreamReader({"path": str(path), "maxEventsPerBatch": "25"})
    # simulate restart: Spark hands the checkpointed batch range straight
    # to partitions() — initialOffset()/commit() are never called first
    parts = r.partitions({"row": 50}, {"row": 75})
    assert sum(p.hi - p.lo for p in parts if p.fp) == 25
    nxt = r.latestOffset()
    assert nxt["row"] >= 75, nxt
    assert nxt["row"] <= 75 + 25  # still rate-capped from the sync point


def test_stream_respects_rate_cap_and_matches_batch(spark, tmp_path):
    path, total = _write_queue(tmp_path)
    cap = 25
    spark.dataSource.register(PayloadQueueDataSource)
    stream = (
        spark.readStream.format("payload_queue")
        .option("path", path)
        .option("maxEventsPerBatch", str(cap))
        .load()
        .withColumn("_batch", F.spark_partition_id() * 0)  # placeholder col
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("queue_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # Python sources don't support Trigger.AvailableNow, and
    # processAllAvailable() can return between rate-capped micro-batches
    # (caught-up == last *fetched* offset, not the queue end) — poll the
    # sink until the queue is drained.
    _drain(spark, q, "queue_out", total)
    out = spark.sql("SELECT offset, payload FROM queue_out")
    assert out.count() == total
    assert sorted(r["offset"] for r in out.select("offset").collect()) == list(
        range(total)
    )
    # rate cap: availableNow drains in ceil(total/cap) micro-batches
    progress = q.recentProgress
    n_data_batches = sum(1 for p in progress if p["numInputRows"] > 0)
    assert n_data_batches == math.ceil(total / cap)
    assert all(p["numInputRows"] <= cap for p in progress)


def test_pipeline_over_queue_source_equals_batch(spark, tmp_path):
    """The event pipeline produces identical results whether payloads come
    from the batch reader or the rate-capped stream (at-least-once replay
    with idempotent insert_id dedup downstream)."""
    from fxa_amplitude_send_spark.operators.event_pipeline import event_pipeline

    path, total = _write_queue(tmp_path, n_files=2, rows_per_file=30)
    spark.dataSource.register(PayloadQueueDataSource)

    batch_df = spark.read.format("payload_queue").option("path", path).load()
    batch_out = event_pipeline(batch_df, "k").select(
        "device_id", "event_type", "session_id", "insert_id"
    )

    stream = (
        spark.readStream.format("payload_queue")
        .option("path", path)
        .option("maxEventsPerBatch", "17")
        .load()
    )
    q = (
        event_pipeline(stream, "k")
        .select("device_id", "event_type", "session_id", "insert_id")
        .writeStream.format("memory")
        .queryName("queue_pipe_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    _drain(spark, q, "queue_pipe_out", total)
    stream_out = spark.sql(
        "SELECT device_id, event_type, session_id, insert_id FROM queue_pipe_out"
    )
    a = {tuple(r) for r in batch_out.collect()}
    b = {tuple(r) for r in stream_out.collect()}
    assert a == b and len(a) == total


def test_batch_write_then_read_roundtrip(spark, tmp_path):
    """Queue as a SINK: df.write.format('payload_queue') stages per-task
    files and promotes them on commit; a reader sees exactly the committed
    payloads and no staging residue."""
    import glob

    spark.dataSource.register(PayloadQueueDataSource)
    out = str(tmp_path / "outq")
    import os

    os.makedirs(out, exist_ok=True)
    payloads = [json.dumps({"Fields": {"event_type": "e", "time": i}}) for i in range(50)]
    df = spark.createDataFrame([(p,) for p in payloads], "payload string").repartition(4)
    df.write.format("payload_queue").option("path", out).mode("append").save()

    back = spark.read.format("payload_queue").option("path", out).load()
    got = sorted(r["payload"] for r in back.collect())
    assert got == sorted(payloads)
    assert not glob.glob(out + "/_staging/*.part")


def test_second_batch_write_appends_not_overwrites(spark, tmp_path):
    """Two batch writes to the same queue dir must ACCUMULATE: each commit
    gets a fresh sequence prefix, so the second write can never rename onto
    the first write's committed files (regression: a constant 'batch' tag
    plus zero-based index silently overwrote earlier payloads)."""
    spark.dataSource.register(PayloadQueueDataSource)
    out = str(tmp_path / "outq2")
    import os

    os.makedirs(out, exist_ok=True)
    first = [json.dumps({"n": i}) for i in range(30)]
    second = [json.dumps({"n": i}) for i in range(30, 55)]
    for batch in (first, second):
        df = spark.createDataFrame(
            [(p,) for p in batch], "payload string"
        ).repartition(3)
        df.write.format("payload_queue").option("path", out).mode("append").save()

    back = spark.read.format("payload_queue").option("path", out).load()
    got = sorted(r["payload"] for r in back.collect())
    assert got == sorted(first + second)


def test_stream_write_commits_per_batch(spark, tmp_path):
    """Streaming queue sink: each micro-batch's files are promoted at
    commit(batchId); the queue readback equals the streamed input."""
    spark.dataSource.register(PayloadQueueDataSource)
    src, total = _write_queue(tmp_path, n_files=3, rows_per_file=20)
    out = str(tmp_path / "outq_stream")
    import os

    os.makedirs(out, exist_ok=True)
    stream = (
        spark.readStream.format("payload_queue")
        .option("path", src)
        .option("maxEventsPerBatch", "25")
        .load()
        .select("payload")
    )
    q = (
        stream.writeStream.format("payload_queue")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        n = (
            spark.read.format("payload_queue")
            .option("path", out)
            .load()
            .count()
        )
        if n >= total:
            break
        time.sleep(0.5)
    q.stop()
    back = spark.read.format("payload_queue").option("path", out).load()
    orig = spark.read.format("payload_queue").option("path", src).load()
    assert sorted(r["payload"] for r in back.collect()) == sorted(
        r["payload"] for r in orig.collect()
    )
    # multiple batch tags prove per-batch commits (rate cap 25 over 60 rows)
    # name scheme: payloads-<seq>-<tag>-<i>.jsonl
    import glob

    names = [os.path.basename(f) for f in glob.glob(out + "/payloads-*.jsonl")]
    tags = {f.split("-")[2] for f in names}
    assert len(tags) >= 2
    # commit sequence numbers are unique per commit and strictly ordered,
    # so the sorted listing (= the reader's offset space) is append-only
    seqs = [f.split("-")[1] for f in sorted(names)]
    assert seqs == sorted(seqs)
