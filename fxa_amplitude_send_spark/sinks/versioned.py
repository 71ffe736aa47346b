"""Manifest-based versioned parquet table: snapshot isolation, time travel,
append, and compaction that never invalidates a published snapshot.

This is the Iceberg/Delta core idea reduced to its load-bearing minimum, on
plain parquet + JSON manifests (public table-format design; no external
table-format dependency). Layout:

    <table>/
      data/part-<uuid>.parquet ...        immutable data files
      _manifests/v000001.json ...         one manifest per snapshot
      _manifests/CURRENT                  atomic pointer (rename-committed)

A snapshot manifest lists the exact data files (plus row count and schema
fingerprint) that make up that version. Readers resolve CURRENT (or an
explicit version) and load ONLY the listed files — a writer crash can leave
orphan data files but never a torn table, because a manifest becomes
visible only via an atomic rename of the CURRENT pointer, and data files are
never mutated or reused across versions.

Scale notes (100 TB): readers list one small JSON instead of a directory
scan over millions of files; appends touch only new files; compaction
rewrites data into fewer files and publishes a NEW snapshot while every
older snapshot stays byte-identical readable (file GC is a separate,
explicitly unsafe-window-free step: only files unreferenced by ANY retained
manifest may be deleted).

The reference ETL (/root/reference) has no storage layer; this extends the
engine's warehouse surface per the north star.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_CURRENT = "CURRENT"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:06d}.json")


def _atomic_write(target: str, payload: str) -> None:
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(payload)
    os.replace(tmp, target)  # atomic on POSIX


def current_version(path: str) -> int:
    """Committed version number, or 0 if the table does not exist yet."""
    cur = os.path.join(path, _MANIFEST_DIR, _CURRENT)
    if not os.path.exists(cur):
        return 0
    with open(cur, encoding="utf-8") as fh:
        return int(fh.read().strip())


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version), encoding="utf-8") as fh:
        return json.load(fh)


def _stage_data_files(df: DataFrame, path: str) -> list[str]:
    """Write df into the shared data/ dir under a unique subdir, then return
    the new file names (relative to the table root). Files are immutable once
    written; the staging subdir keeps concurrent writers from colliding."""
    stage = f"stage-{uuid.uuid4().hex}"
    out = os.path.join(path, "data", stage)
    df.write.mode("overwrite").parquet(out)
    rel = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".parquet"):
            rel.append(os.path.join("data", stage, name))
    return rel


def _commit(path: str, files: list[str], n_rows: int, schema_ddl: str, parent: int) -> int:
    version = parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "files": files,
        "n_rows": n_rows,
        "schema": schema_ddl,
    }
    os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
    mpath = _manifest_path(path, version)
    if os.path.exists(mpath):
        raise RuntimeError(
            f"version {version} already committed (concurrent writer?) at {mpath}"
        )
    _atomic_write(mpath, json.dumps(manifest, indent=1))
    _atomic_write(os.path.join(path, _MANIFEST_DIR, _CURRENT), str(version))
    return version


def write_snapshot(df: DataFrame, path: str) -> int:
    """Create version 1 (or fully replace the logical content with a new
    snapshot): stage data files, commit a manifest listing exactly them."""
    files = _stage_data_files(df, path)
    n = _count_staged(df.sparkSession, path, files)
    return _commit(path, files, n, df.schema.simpleString(), current_version(path))


def append_snapshot(df: DataFrame, path: str) -> int:
    """Append: new snapshot = parent's files + newly staged files. Only the
    appended rows are written; existing data files are reused by reference."""
    parent = current_version(path)
    if parent == 0:
        return write_snapshot(df, path)
    prev = _read_manifest(path, parent)
    new_files = _stage_data_files(df, path)
    n_new = _count_staged(df.sparkSession, path, new_files)
    return _commit(
        path,
        prev["files"] + new_files,
        prev["n_rows"] + n_new,
        prev["schema"],
        parent,
    )


def compact_snapshot(spark: SparkSession, path: str, target_files: int) -> int:
    """Rewrite the CURRENT snapshot's rows into ``target_files`` data files
    and publish that as a new version. Older snapshots keep referencing the
    original files, which are left in place — time travel across a
    compaction is exact."""
    version = current_version(path)
    if version == 0:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    prev = _read_manifest(path, version)
    df = read_snapshot(spark, path, version).coalesce(target_files)
    files = _stage_data_files(df, path)
    return _commit(path, files, prev["n_rows"], prev["schema"], version)


def read_snapshot(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Time-travel read: the file list of ``version`` (default CURRENT),
    loaded directly — no directory listing, so orphaned/staged/compacted-away
    files are invisible by construction."""
    v = current_version(path) if version is None else version
    manifest = _read_manifest(path, v)
    paths = [os.path.join(path, f) for f in manifest["files"]]
    return spark.read.parquet(*paths)


def snapshot_info(path: str, version: int | None = None) -> dict:
    v = current_version(path) if version is None else version
    return _read_manifest(path, v)


def vacuum(path: str, retain_versions: int = 2) -> list[str]:
    """Delete data files unreferenced by every retained manifest (the newest
    ``retain_versions`` snapshots). Returns deleted table-relative paths.
    Deleting only NEVER-referenced-by-retained files means a reader of any
    retained version can never lose files mid-query."""
    newest = current_version(path)
    if newest == 0:
        return []
    keep_versions = range(max(1, newest - retain_versions + 1), newest + 1)
    referenced: set[str] = set()
    for v in keep_versions:
        referenced.update(_read_manifest(path, v)["files"])
    deleted = []
    data_root = os.path.join(path, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for name in files:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, path)
            if name.endswith(".parquet") and rel not in referenced:
                os.remove(full)
                deleted.append(rel)
    # drop manifests older than the retained window so time travel contracts
    # honestly report what is still readable
    for v in range(1, keep_versions.start):
        mp = _manifest_path(path, v)
        if os.path.exists(mp):
            os.remove(mp)
    return deleted


def _count_staged(spark: SparkSession, path: str, files: list[str]) -> int:
    return spark.read.parquet(*[os.path.join(path, f) for f in files]).count()
