"""End-to-end demo: the lakehouse loop on the versioned table.

Shows the storage surface composed the way a production pipeline would run
it, with every guarantee exercised in order:

  1. curate a slice of events into versioned-table v1
  2. stream new events in with EXACTLY-ONCE appends (foreachBatch txn guard)
  3. compact small files — old versions stay readable (time travel)
  4. tail the table as a CDC STREAM (readStream.format("versioned_table"))
     into a downstream aggregate — compaction contributes no duplicates
  4b. MERGE (upsert) + DELETE, then read the change feed
      (readChangeFeed=true): inserts / update post-images / delete
      pre-images, each counted
  5. prune a point-range read at the MANIFEST level (no file opens)
  6. vacuum past-retention files and show what survived

    python examples/run_lakehouse_roundtrip.py [--sf-dir /root/testdata/sf0.001]

All pieces are individually pytest-verified (tests/test_versioned_table.py);
this script exists to show them composed.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = parser.parse_args()

    from pyspark.sql import functions as F

    from fxa_amplitude_send_spark.session import build_session
    from fxa_amplitude_send_spark.sinks.versioned import (
        compact_snapshot,
        current_version,
        pruned_file_count,
        read_snapshot,
        snapshot_info,
        vacuum,
        versioned_stream_writer,
        write_snapshot,
    )
    from fxa_amplitude_send_spark.sources import load_table
    from fxa_amplitude_send_spark.sources.versioned_stream import (
        VersionedTableDataSource,
    )

    spark = build_session("lakehouse-roundtrip")
    spark.dataSource.register(VersionedTableDataSource)
    root = tempfile.mkdtemp(prefix="lakehouse-")
    table = os.path.join(root, "events_table")
    stage = os.path.join(root, "incoming")
    ckpt_in = os.path.join(root, "ckpt_in")
    out = os.path.join(root, "rollup")
    ckpt_out = os.path.join(root, "ckpt_out")

    events = load_table(spark, args.sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n = events.count()

    # 1. initial snapshot: first half of the corpus, range-partitioned so
    # each file covers a disjoint event_id range (prunable layout)
    write_snapshot(
        events.filter(F.col("event_id") % 2 == 0).repartitionByRange(6, "event_id"),
        table,
    )
    print(f"v{current_version(table)}: initial snapshot "
          f"({snapshot_info(table)['n_rows']} rows, "
          f"{len(snapshot_info(table)['files'])} files)")

    # 2. stream the second half in with exactly-once appends
    events.filter(F.col("event_id") % 2 == 1).repartition(3).write.mode(
        "overwrite"
    ).parquet(stage)
    incoming = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = versioned_stream_writer(incoming, table, ckpt_in)
    q.processAllAvailable()
    q.stop()
    print(f"v{current_version(table)}: streamed appends, table now "
          f"{snapshot_info(table)['n_rows']} rows (corpus = {n})")

    # 3. compact; time travel to v1 still exact
    v_before = current_version(table)
    compact_snapshot(spark, table, target_files=2)
    assert read_snapshot(spark, table, 1).count() == snapshot_info(table, 1)["n_rows"]
    print(f"v{current_version(table)}: compacted "
          f"{len(snapshot_info(table, v_before)['files'])} files -> "
          f"{len(snapshot_info(table)['files'])}; v1 still readable")

    # 4. tail the change feed into a per-type rollup (compaction emits nothing)
    feed = spark.readStream.format("versioned_table").option("path", table).load()
    q2 = (
        feed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt_out)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    tailed = spark.read.parquet(out)
    assert tailed.count() == n, (tailed.count(), n)
    rollup = tailed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    print("CDC tail rollup (exactly-once through appends + compaction):")
    for r in rollup.orderBy("event_type").collect():
        print(f"  {r['event_type']:10s} n={r['n']:6d} total={r['total']}")

    # 4b. full CRUD: merge (upsert) then delete, with CDF visibility
    from fxa_amplitude_send_spark.sinks.versioned import (
        delete_snapshot,
        merge_snapshot,
    )

    updates = events.filter(F.col("event_id") < 10).withColumn(
        "value", F.col("value") + 1000
    )
    merge_snapshot(spark, table, updates, ["event_id"])
    delete_snapshot(spark, table, "event_type = 'error'")
    n_after = read_snapshot(spark, table).count()
    feed2 = (
        spark.readStream.format("versioned_table").option("path", table)
        .option("readChangeFeed", "true").load()
    )
    q3 = (
        feed2.writeStream.format("parquet")
        .option("path", os.path.join(root, "cdf"))
        .option("checkpointLocation", os.path.join(root, "ckpt_cdf"))
        .start()
    )
    q3.processAllAvailable()
    q3.stop()
    cdf = spark.read.parquet(os.path.join(root, "cdf"))
    by_type = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"after merge+delete: {n_after} rows; CDF counts: {by_type}")

    # 5. manifest-level pruning: on the range-partitioned v1 layout a narrow
    # event_id range opens almost nothing (CURRENT was just compacted to 2
    # coarse files — layout, not format, decides skipping)
    scanned, total = pruned_file_count(table, ("event_id", 0, 50), version=1)
    print(f"manifest pruning for event_id in [0, 50] at v1: {scanned}/{total} files")
    scanned_c, total_c = pruned_file_count(table, ("event_id", 0, 50))
    print(f"  same predicate on the compacted CURRENT: {scanned_c}/{total_c}")

    # 6. vacuum: retain only CURRENT -> superseded files are deleted
    deleted = vacuum(table, retain_versions=1, grace_seconds=0.0)
    assert read_snapshot(spark, table).count() == n_after
    print(f"vacuum removed {len(deleted)} unreferenced files; "
          f"CURRENT still {n_after} rows")

    spark.stop()


if __name__ == "__main__":
    main()
