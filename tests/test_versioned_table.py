"""Manifest-based versioned table: snapshot isolation, time travel across
append and compaction, crash-safe commits, and vacuum retention contracts."""

from __future__ import annotations

import os

import pytest

from fxa_amplitude_send_spark.sinks.versioned import (
    append_snapshot,
    compact_snapshot,
    current_version,
    read_snapshot,
    snapshot_info,
    vacuum,
    write_snapshot,
)
from fxa_amplitude_send_spark.sources import load_table


def _ids(df):
    return sorted(r[0] for r in df.select(df.columns[0]).collect())


@pytest.fixture()
def base(spark, sf_smoke):
    return load_table(spark, sf_smoke, "nation").select("n_nationkey", "n_name")


def test_write_read_roundtrip(spark, base, tmp_path):
    path = str(tmp_path / "t")
    v = write_snapshot(base, path)
    assert v == 1 and current_version(path) == 1
    assert _ids(read_snapshot(spark, path)) == _ids(base)


def test_append_creates_new_version_and_old_stays_readable(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(base.filter("n_nationkey < 10"), path)
    v2 = append_snapshot(base.filter("n_nationkey >= 10"), path)
    assert v2 == 2
    assert _ids(read_snapshot(spark, path)) == _ids(base)
    assert _ids(read_snapshot(spark, path, version=1)) == _ids(
        base.filter("n_nationkey < 10")
    )
    assert snapshot_info(path)["n_rows"] == base.count()


def test_compaction_preserves_rows_and_time_travel(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(base.repartition(8), path)
    v2 = compact_snapshot(spark, path, target_files=1)
    assert v2 == 2
    assert len(snapshot_info(path, 2)["files"]) == 1
    assert len(snapshot_info(path, 1)["files"]) > 1
    assert _ids(read_snapshot(spark, path, 1)) == _ids(base)
    assert _ids(read_snapshot(spark, path, 2)) == _ids(base)


def test_orphan_staged_files_invisible_to_readers(spark, base, tmp_path):
    """A crashed writer (data staged, manifest never committed) must not
    change what readers see — the manifest IS the table."""
    path = str(tmp_path / "t")
    write_snapshot(base, path)
    # simulate a crash: stage data without committing a manifest
    from fxa_amplitude_send_spark.sinks.versioned import _stage_data_files

    _stage_data_files(base, path)
    assert _ids(read_snapshot(spark, path)) == _ids(base)
    assert current_version(path) == 1


def test_vacuum_removes_only_unreferenced_files(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(base.repartition(4), path)
    compact_snapshot(spark, path, target_files=1)  # v2
    append_snapshot(base.limit(5), path)  # v3
    deleted = vacuum(path, retain_versions=2)  # keep v2, v3 → v1 files go
    assert deleted, "v1's pre-compaction files should be deleted"
    # retained versions still fully readable
    assert read_snapshot(spark, path, 2).count() == base.count()
    assert read_snapshot(spark, path, 3).count() == base.count() + 5
    # vacuumed version is gone (manifest removed)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, 1)


def test_double_commit_same_version_refused(base, tmp_path):
    path = str(tmp_path / "t")
    write_snapshot(base, path)
    # simulate a lost-update race: another writer already wrote v2's manifest
    from fxa_amplitude_send_spark.sinks.versioned import _manifest_path

    os.makedirs(os.path.dirname(_manifest_path(path, 2)), exist_ok=True)
    with open(_manifest_path(path, 2), "w") as fh:
        fh.write("{}")
    with pytest.raises(RuntimeError, match="concurrent"):
        append_snapshot(base, path)
