"""End-to-end demo: the merge-on-read lifecycle on the versioned table.

The round-6f storage surface composed the way an operator would run it:

  1. bloom policy + initial load; point lookup skips files min/max can't
  2. MoR DELETE — tombstones only, zero data files rewritten
  3. MoR MERGE (upsert) — tombstones + appended post-images, O(changes)
  4. targeted OPTIMIZE — rewrite only dead-heavy files, vectors cleared
  5. zero-copy CLONE — hardlinked bytes, divergent histories
  6. bad batch → RESTORE, then DESCRIBE HISTORY + TIMESTAMP AS OF

    python examples/run_mor_lifecycle.py [--sf-dir /root/testdata/sf0.001]

All pieces are individually pytest-verified (tests/test_versioned_table.py)
and driver-gated (q_versioned_bloom / _mor_delete / _mor_merge /
_optimize / _clone / _restore); this script exists to show them composed.
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
        bloom_pruned_file_count,
        clone_snapshot,
        delete_snapshot_mor,
        merge_snapshot_mor,
        optimize_snapshot,
        read_snapshot,
        restore_snapshot,
        set_bloom_policy,
        snapshot_info,
        table_history,
        version_at_timestamp,
        write_snapshot,
    )
    from fxa_amplitude_send_spark.sources import load_table

    spark = build_session("mor-lifecycle-demo")
    root = tempfile.mkdtemp(prefix="mor_demo_")
    table = os.path.join(root, "events")

    ev = load_table(spark, args.sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    # 1. bloom policy + load; point lookup
    set_bloom_policy(table, ["event_id"])
    write_snapshot(ev.repartition(8), table)
    probe = ev.select("event_id").filter("event_id >= 500").head()[0]
    scanned, total = bloom_pruned_file_count(table, "event_id", probe)
    print(f"1. point lookup event_id={probe}: bloom keeps {scanned}/{total} files")

    # 2. MoR delete
    files_before = [e["path"] for e in snapshot_info(table)["files"]]
    delete_snapshot_mor(spark, table, "value >= 90")
    info = snapshot_info(table)
    assert [e["path"] for e in info["files"]] == files_before
    print(f"2. MoR delete: 0 files rewritten, {len(info['dvs'])} tombstone file(s),"
          f" n_rows={info['n_rows']}")

    # 3. MoR merge
    upd = ev.filter("event_id % 50 = 0").select(
        "event_id", F.lit("remapped").alias("event_type"),
        (F.col("value") * 0.5).alias("value"),
    )
    merge_snapshot_mor(spark, table, upd, ["event_id"])
    info = snapshot_info(table)
    print(f"3. MoR merge: files {len(files_before)} -> {len(info['files'])} "
          f"(appended post-images), dvs={len(info['dvs'])}")

    # 4. targeted optimize
    v = optimize_snapshot(spark, table, dead_ratio=0.05, target_files=4)
    info = snapshot_info(table, v)
    print(f"4. optimize: v{v}, {len(info['files'])} files, vectors cleared: "
          f"{'dvs' not in info}")

    # 5. zero-copy clone + divergence
    clone = os.path.join(root, "events_clone")
    clone_snapshot(table, clone)
    delete_snapshot_mor(spark, clone, "event_type = 'remapped'")
    n_src = read_snapshot(spark, table).count()
    n_clone = read_snapshot(spark, clone).count()
    print(f"5. clone diverged: source={n_src} rows, clone={n_clone} rows, "
          "bytes shared via hardlinks")

    # 6. bad batch -> restore; history + timestamp travel
    import time

    t_good = time.time()
    from fxa_amplitude_send_spark.sinks.versioned import append_snapshot

    append_snapshot(ev.limit(500).withColumn("value", F.lit(-1.0)), table)
    restore_snapshot(table, v)
    hist = table_history(table)
    print("6. history (newest first):",
          [(h["version"], h["kind"], h["n_rows"]) for h in hist])
    print(f"   TIMESTAMP AS OF t_good -> v{version_at_timestamp(table, t_good)}")

    spark.stop()


if __name__ == "__main__":
    main()
