"""Incrementally maintained materialized views over versioned tables.

A materialized view here is a grouped aggregate — ``GROUP BY keys`` with
``COUNT(*)`` and ``SUM(col)`` measures — kept in sync with a versioned base
table (sinks/versioned.py) by consuming its change feed instead of
recomputing from scratch. This is the classic *counting algorithm* for
incremental view maintenance (Gupta & Mumick, "Maintenance of Materialized
Views"), which is what a 100 TB lakehouse needs: a refresh costs
O(changed rows since last refresh), never O(base table).

Change-row algebra: each CDF row carries a sign —

    insert / update_postimage  →  +1
    delete / update_preimage   →  −1

so the per-group delta is ``SUM(sign)`` for the count and ``SUM(sign·x)``
for each sum measure. Applying the delta to the stored view is a key-equi
outer merge; groups whose maintained count reaches 0 are dropped (they have
no supporting base rows left). AVG is derived (sum/count) by readers.
MIN/MAX are deliberately unsupported: they are not self-maintainable under
deletes (retracting the current minimum needs the base table), so asking for
them raises instead of silently recomputing.

The view itself is stored as a versioned table, so MV readers get the same
snapshot isolation / time travel as base-table readers, and every refresh is
an atomic commit. ``_mv_meta.json`` (inside the MV directory, next to the
manifests) records the definition and the last base version folded in —
refresh is idempotent: re-running with no new base versions is a no-op.

Durability contract with vacuum: refresh only ever reads base CHANGE data in
(last_synced, current]; older base versions can be vacuumed away without
breaking refresh — asserted by test_mv_refresh_after_base_vacuum.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import (
    _commit,
    _count_staged,
    _read_manifest,
    _stage_data_files,
    current_version,
    read_snapshot,
    write_snapshot,
)

_META = "_mv_meta.json"

def _sign():
    """Sign each change type contributes to the counting algorithm (built
    lazily: Column construction needs an active SparkContext)."""
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))


def _meta_path(mv_path: str) -> str:
    return os.path.join(mv_path, _META)


def _load_meta(mv_path: str) -> dict:
    with open(_meta_path(mv_path), encoding="utf-8") as fh:
        return json.load(fh)


def _save_meta(mv_path: str, meta: dict) -> None:
    os.makedirs(mv_path, exist_ok=True)
    tmp = _meta_path(mv_path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    os.replace(tmp, _meta_path(mv_path))


def _aggregate(df: DataFrame, keys: list[str], sums: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("mv_count"),
        *[F.sum(c).alias(f"sum_{c}") for c in sums],
    )


def create_mv(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    keys: list[str],
    sums: list[str],
    aggs: list[str] | None = None,
) -> int:
    """Materialize ``SELECT keys, COUNT(*), SUM(sums...) GROUP BY keys`` over
    the base table's CURRENT version. Returns the MV's committed version."""
    if aggs:
        bad = [a for a in aggs if a.lower() not in ("count", "sum")]
        if bad:
            raise ValueError(
                f"aggregates {bad} are not self-maintainable under deletes "
                "(min/max retraction needs the base table); supported: count, sum"
            )
    base_version = current_version(base_path)
    if base_version == 0:
        raise FileNotFoundError(f"no committed snapshot at {base_path}")
    view = _aggregate(read_snapshot(spark, base_path, base_version), keys, sums)
    v = write_snapshot(view, mv_path)
    _save_meta(
        mv_path,
        {
            "base_path": os.path.abspath(base_path),
            "keys": keys,
            "sums": sums,
            "base_version_synced": base_version,
            "mv_version": v,
        },
    )
    return v


def _change_feed(
    spark: SparkSession, base_path: str, lo: int, hi: int, columns: list[str]
) -> DataFrame | None:
    """All change rows for base versions in (lo, hi], with _change_type.

    Append commits list their files under ``appended`` (plain inserts —
    _change_type synthesized); merge/delete commits list dedicated change
    files under ``changes`` (the column is physical). Compactions contribute
    nothing. REPLACE commits (write_snapshot over an existing base) are
    refused: a replace lists ALL its files under ``appended``, so folding it
    would add the whole replacement without retracting prior content —
    the delta of a full replace is simply not expressible as change rows,
    the view must be rebuilt. Reads only files belonging to versions in the
    window — the O(changes) property."""
    inserts: list[str] = []
    physical: list[str] = []
    for v in range(lo + 1, hi + 1):
        try:
            m = _read_manifest(base_path, v)
        except FileNotFoundError:
            raise RuntimeError(
                f"base {base_path}: version {v} was vacuumed past the MV's "
                f"unsynced window ({lo}, {hi}] — retention must cover every "
                "version since the last refresh; rebuild with create_mv()"
            ) from None
        if m.get("kind") == "replace":
            raise RuntimeError(
                f"base {base_path}: version {v} is a full REPLACE "
                "(write_snapshot over existing content) — its manifest lists "
                "the entire replacement under 'appended', which is not an "
                "incremental delta; rebuild the view with create_mv()"
            )
        inserts += [os.path.join(base_path, rel) for rel in m.get("appended", [])]
        physical += [os.path.join(base_path, rel) for rel in m.get("changes", [])]
    parts = []
    if inserts:
        parts.append(
            spark.read.parquet(*inserts)
            .select(*columns)
            .withColumn("_change_type", F.lit("insert"))
        )
    if physical:
        parts.append(spark.read.parquet(*physical).select(*columns, "_change_type"))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def refresh_mv(spark: SparkSession, mv_path: str) -> int:
    """Fold every base version committed since the last refresh into the
    view. Cost is O(change rows), independent of base-table size. Returns
    the MV version (unchanged if the base hasn't moved)."""
    meta = _load_meta(mv_path)
    # crash coherence: the meta records which MV version its
    # base_version_synced belongs to. A crash between a refresh's snapshot
    # commit and its meta write leaves them out of step; folding the same
    # change window again would silently double-count, so refuse and ask for
    # a rebuild instead.
    if meta.get("mv_version") is not None and meta["mv_version"] != current_version(
        mv_path
    ):
        raise RuntimeError(
            f"mv at {mv_path}: meta records mv_version {meta['mv_version']} but "
            f"CURRENT is {current_version(mv_path)} — a prior refresh crashed "
            "between commit and meta write; rebuild with create_mv()"
        )
    base_path, keys, sums = meta["base_path"], meta["keys"], meta["sums"]
    lo, hi = meta["base_version_synced"], current_version(base_path)
    if hi <= lo:
        return current_version(mv_path)

    changes = _change_feed(spark, base_path, lo, hi, keys + sums)
    if changes is None:  # only compactions happened
        meta["base_version_synced"] = hi
        _save_meta(mv_path, meta)
        return current_version(mv_path)

    delta = changes.groupBy(*keys).agg(
        F.sum(_sign()).cast("long").alias("d_count"),
        *[F.sum(_sign() * F.col(c)).alias(f"d_sum_{c}") for c in sums],
    )

    # Pin the MV version this refresh folds ON TOP OF. The commit below
    # targets exactly cur_mv_version + 1, so of two refreshers racing over
    # the same window exactly one wins the O_EXCL manifest create; the loser
    # must NOT retry its commit against the new parent (that would fold the
    # same change window twice — double-counted sums).
    cur_mv_version = current_version(mv_path)
    cur = read_snapshot(spark, mv_path, cur_mv_version)
    merged = (
        cur.alias("m")
        .join(delta.alias("d"), keys, "full_outer")
        .select(
            *keys,
            (
                F.coalesce(F.col("m.mv_count"), F.lit(0))
                + F.coalesce(F.col("d.d_count"), F.lit(0))
            ).alias("mv_count"),
            *[
                (
                    F.coalesce(F.col(f"m.sum_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"d.d_sum_{c}"), F.lit(0))
                ).alias(f"sum_{c}")
                for c in sums
            ],
        )
        .filter(F.col("mv_count") > 0)  # groups with no supporting rows drop out
    )

    files = _stage_data_files(merged, mv_path)
    n = _count_staged(spark, mv_path, files)
    try:
        v = _commit(
            mv_path, files, n, merged.schema.json(), cur_mv_version, kind="replace"
        )
    except RuntimeError:
        # The O_EXCL manifest create has exactly one winner per version: a
        # concurrent refresher already committed cur_mv_version + 1 with this
        # same change window folded in. Committing our copy on top would
        # apply the window twice, so discard the staged result. If the
        # winner's meta write has landed, the window is synced and we can
        # return quietly; if not (it is still in its commit→meta gap), the
        # caller must rerun — the rerun either no-ops (meta landed) or trips
        # the crash-coherence refusal (winner died in the gap), both safe.
        fresh = _load_meta(mv_path)
        if fresh["base_version_synced"] >= hi:
            return current_version(mv_path)
        raise RuntimeError(
            f"mv at {mv_path}: concurrent refresh detected (version "
            f"{cur_mv_version + 1} already committed by another refresher) — "
            "rerun refresh_mv()"
        ) from None
    meta["base_version_synced"] = hi
    meta["mv_version"] = v
    _save_meta(mv_path, meta)
    return v


def read_mv(spark: SparkSession, mv_path: str, version: int | None = None) -> DataFrame:
    """The view's CURRENT (or time-travel) contents: keys, mv_count, sum_*."""
    return read_snapshot(spark, mv_path, version)
