"""Incremental corpus ingestion: cross-batch dedup against the persisted
fingerprint index, exactly-once table appends, crash-replay repair."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxa_amplitude_send_spark.sinks.versioned import read_snapshot
from fxa_amplitude_send_spark.sources import load_table
from fxa_amplitude_send_spark.streaming.corpus_ingest import (
    dedup_ingest_stream,
    ingest_batch,
)


def _docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents").select("doc_id", "text")


def test_batch_ingest_dedups_within_and_across_batches(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    b1 = docs.filter("doc_id < 100")
    n_unique_b1 = b1.select("text").distinct().count()
    admitted1 = ingest_batch(b1, table, index, "t-1")
    assert admitted1 == n_unique_b1  # in-batch exact dedup

    # second batch overlaps b1's content plus brings new docs
    b2 = docs.filter("doc_id < 150")
    already = b1.select("text").distinct()
    expected_new = (
        b2.select("text").distinct().join(already, "text", "left_anti").count()
    )
    admitted2 = ingest_batch(b2, table, index, "t-2")
    assert admitted2 == expected_new

    total = read_snapshot(spark, table).count()
    assert total == n_unique_b1 + expected_new
    # table content is globally duplicate-free by text
    assert (
        read_snapshot(spark, table).select("text").distinct().count() == total
    )


def test_replayed_batch_repairs_index_without_duplicates(spark, sf_smoke, tmp_path):
    """A crash after the doc commit but before the index write re-runs the
    batch: the txn guard makes the append a no-op and the index repair is
    idempotent for readers (set semantics via anti-join)."""
    docs = _docs(spark, sf_smoke)
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    ingest_batch(docs.filter("doc_id < 50"), table, index, "t-1")
    n1 = read_snapshot(spark, table).count()
    # replay the SAME txn (same batch): no new rows
    ingest_batch(docs.filter("doc_id < 50"), table, index, "t-1")
    assert read_snapshot(spark, table).count() == n1
    # and a later batch still dedups correctly against the index
    ingest_batch(docs.filter("doc_id < 60"), table, index, "t-2")
    final = read_snapshot(spark, table)
    assert final.select("text").distinct().count() == final.count()


def test_streaming_ingest_end_to_end(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    # files arrive with overlapping content (docs corpus contains dup texts)
    docs.filter("doc_id < 200").repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = dedup_ingest_stream(stream, table, index)
    q.processAllAvailable()
    q.stop()

    expected = docs.filter("doc_id < 200").select("text").distinct().count()
    got = read_snapshot(spark, table)
    assert got.count() == expected
    assert got.select("text").distinct().count() == expected


def test_crash_between_commit_and_index_write_is_repaired(spark, sf_smoke, tmp_path):
    """Simulated crash: docs committed, index write lost. The replay must
    repair the index so LATER batches cannot re-admit the same texts."""
    import shutil

    docs = _docs(spark, sf_smoke)
    table = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    ingest_batch(docs.filter("doc_id < 40"), table, index, "t-1")
    n1 = read_snapshot(spark, table).count()
    shutil.rmtree(index)  # crash: index write lost (docs committed)

    # replay of t-1: append is a txn no-op, but the index must be repaired
    ingest_batch(docs.filter("doc_id < 40"), table, index, "t-1")
    assert read_snapshot(spark, table).count() == n1

    # a later overlapping batch must still dedup against the repaired index
    ingest_batch(docs.filter("doc_id < 45"), table, index, "t-2")
    final = read_snapshot(spark, table)
    assert final.select("text").distinct().count() == final.count()
