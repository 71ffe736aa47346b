"""Incremental corpus ingestion with cross-batch dedup — the pattern a
100 TB training-data pipeline actually runs: new documents arrive
continuously, and each micro-batch must be deduplicated BOTH within itself
and against everything ever ingested, without re-deduplicating the corpus.

Composition of existing engine pieces:

  stream of docs ──foreachBatch──▶ in-batch exact dedup (min doc_id per
  fingerprint) ──▶ anti-join against the persisted FINGERPRINT INDEX
  (32-byte SHA-256 keys only — the historical corpus text never reloads)
  ──▶ exactly-once append of surviving docs to a versioned table
  ──▶ append the new fingerprints to the index

Crash safety: the doc append is idempotent via the (queryId, batchId) txn
guard (sinks/versioned.append_snapshot_idempotent); the fingerprint index
is updated AFTER the doc commit, so a crash between the two re-runs the
batch, finds the txn already applied, and only repairs the index — new
fingerprints are re-derived from the batch, and re-appending them is
harmless (the index is a set; the anti-join tolerates duplicates).

Scale: per batch, work is O(batch) + one equi-join of batch fingerprints
against the hash-partitioned index — never O(corpus). The reference ETL's
analogue is its insert_id idempotence at the sink (utils.js:74); here the
dedup key is content-derived and the "sink" is the lakehouse table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.versioned import append_snapshot_idempotent


def _fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select(F.sha2(F.col("text"), 256).alias("fingerprint"))


def ingest_batch(
    batch_docs: DataFrame, table_path: str, index_path: str, txn_id: str
) -> int:
    """Process one batch: in-batch dedup, historical anti-join, exactly-once
    append, index update. Returns the number of NEW documents admitted."""
    spark = batch_docs.sparkSession
    deduped = (
        batch_docs.withColumn("fingerprint", F.sha2(F.col("text"), 256))
        .groupBy("fingerprint")
        .agg(F.min(F.struct(*batch_docs.columns)).alias("_doc"))
        .select("fingerprint", "_doc.*")
    )
    if os.path.exists(index_path):
        index = spark.read.parquet(index_path)
        fresh = deduped.join(index, "fingerprint", "left_anti")
    else:
        fresh = deduped
    fresh = fresh.localCheckpoint(eager=True)  # stable across the two writes
    n_new = fresh.count()
    if n_new:
        append_snapshot_idempotent(fresh.drop("fingerprint"), table_path, txn_id)
        # ALWAYS record the fingerprints when any survived the anti-join:
        # `fresh` is non-empty precisely when the index lacks them — either
        # this is a first run, or a replay repairing a crash that landed the
        # doc commit but lost the index write. (A replay whose index write
        # DID land sees fresh empty and never reaches here, so no bloat.)
        fresh.select("fingerprint").write.mode("append").parquet(index_path)
    return n_new


def dedup_ingest_stream(stream_docs: DataFrame, table_path: str, index_path: str):
    """Start the streaming ingestion: each micro-batch runs ingest_batch
    under a (queryId, batchId) transaction id. Checkpoint-restart replays
    at most the last uncommitted batch, which the txn guard absorbs."""

    checkpoint = table_path + "_ingest_ckpt"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # query-scoped tag (real queryId local property, or checkpoint hash)
        # — see sinks/versioned.streaming_txn_tag for why conf.get won't do
        from ..sinks.versioned import streaming_txn_tag

        qid = streaming_txn_tag(batch_df, checkpoint)
        ingest_batch(batch_df, table_path, index_path, f"{qid}-{batch_id}")
    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
