"""Randomized operation-sequence fuzz for the merge-on-read table algebra.

A seeded generator drives a random interleaving of append / MoR delete /
CoW delete / MoR merge / compact / optimize / restore against a versioned
table while a driver-side MODEL (a plain dict keyed by event_id) applies
the same logical operation. After EVERY op, read_snapshot must equal the
model exactly, and after the whole sequence every historical version must
still equal its recorded model snapshot (time-travel immutability across
arbitrary interleavings — the property unit tests can't sweep).

Mirrors the star-view fuzz (tests/test_star_mv.py) at the storage layer.
"""

from __future__ import annotations

import random

import pytest

from fxa_amplitude_send_spark.sinks.versioned import (
    append_snapshot,
    compact_snapshot,
    current_version,
    delete_snapshot,
    delete_snapshot_mor,
    merge_snapshot_mor,
    optimize_snapshot,
    read_snapshot,
    restore_snapshot,
)
from fxa_amplitude_send_spark.sources import load_table


def _snap(df):
    return {r.event_id: (r.event_type, round(r.value, 6)) for r in df.collect()}


@pytest.mark.parametrize("seed", [7, 23, 61])
def test_mor_operation_sequence_fuzz(spark, sf_smoke, tmp_path, seed):
    rng = random.Random(seed)
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("event_id", "event_type", "value")
        .limit(400)
    )
    rows = ev.collect()
    pool = [(r.event_id, r.event_type, round(r.value, 6)) for r in rows]
    path = str(tmp_path / "t")

    first = pool[:150]
    model = {i: (t, v) for i, t, v in first}
    df0 = spark.createDataFrame(first, ["event_id", "event_type", "value"])
    from fxa_amplitude_send_spark.sinks.versioned import write_snapshot

    write_snapshot(df0, path)
    history = {1: dict(model)}

    def check():
        assert _snap(read_snapshot(spark, path)) == model

    ops = ["append", "mor_delete", "cow_delete", "mor_merge", "compact",
           "optimize", "restore"]
    for step in range(14):
        op = rng.choice(ops)
        v_before = current_version(path)
        if op == "append":
            batch = rng.sample([p for p in pool if p[0] not in model],
                               k=min(25, len(pool) - len(model)) or 1)
            batch = [p for p in batch if p[0] not in model]
            if not batch:
                continue
            append_snapshot(
                spark.createDataFrame(batch, ["event_id", "event_type", "value"]),
                path,
            )
            model.update({i: (t, v) for i, t, v in batch})
        elif op in ("mor_delete", "cow_delete"):
            m = rng.choice([3, 5, 7, 11])
            r = rng.randrange(m)
            pred = f"event_id % {m} = {r}"
            (delete_snapshot_mor if op == "mor_delete" else delete_snapshot)(
                spark, path, pred
            )
            model = {i: tv for i, tv in model.items() if i % m != r}
        elif op == "mor_merge":
            if not model:
                continue
            keys = rng.sample(sorted(model), k=min(20, len(model)))
            upd = [(i, "fuzzed", round(model[i][1] * 0.5, 6)) for i in keys]
            new_key = max(pool, key=lambda p: p[0])[0] + 1000 + step
            upd.append((new_key, "fuzz_new", 1.25))
            merge_snapshot_mor(
                spark,
                path,
                spark.createDataFrame(upd, ["event_id", "event_type", "value"]),
                ["event_id"],
            )
            for i, t, v in upd:
                model[i] = (t, v)
        elif op == "compact":
            compact_snapshot(spark, path, target_files=rng.choice([1, 2, 4]))
        elif op == "optimize":
            optimize_snapshot(spark, path, dead_ratio=0.2, target_files=2)
            if current_version(path) == v_before:
                continue  # no victims: no version, no history entry
        elif op == "restore":
            target = rng.choice(sorted(history))
            restore_snapshot(path, target)
            model = dict(history[target])
        history[current_version(path)] = dict(model)
        check()

    # time-travel immutability across the whole interleaving
    for v, snap in history.items():
        assert _snap(read_snapshot(spark, path, version=v)) == snap


@pytest.mark.parametrize("seed", [11, 43])
def test_clone_lineage_fuzz(spark, sf_smoke, tmp_path, seed):
    """Clone mid-sequence, then drive DIFFERENT random op tails on source
    and clone: each lineage must track its own model exactly — shared
    bytes, zero cross-talk."""
    rng = random.Random(seed)
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("event_id", "event_type", "value")
        .limit(300)
    )
    pool = [(r.event_id, r.event_type, round(r.value, 6)) for r in ev.collect()]
    from fxa_amplitude_send_spark.sinks.versioned import (
        clone_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "src")
    first = pool[:120]
    model = {i: (t, v) for i, t, v in first}
    write_snapshot(
        spark.createDataFrame(first, ["event_id", "event_type", "value"]), src
    )
    delete_snapshot_mor(spark, src, "event_id % 4 = 1")
    model = {i: tv for i, tv in model.items() if i % 4 != 1}

    dst = str(tmp_path / "dst")
    clone_snapshot(src, dst)
    models = {src: dict(model), dst: dict(model)}

    for step in range(8):
        path = rng.choice([src, dst])
        m = models[path]
        op = rng.choice(["append", "mor_delete", "mor_merge"])
        if op == "append":
            batch = [p for p in rng.sample(pool, k=20) if p[0] not in m][:10]
            if not batch:
                continue
            append_snapshot(
                spark.createDataFrame(batch, ["event_id", "event_type", "value"]),
                path,
            )
            m.update({i: (t, v) for i, t, v in batch})
        elif op == "mor_delete":
            mod = rng.choice([5, 7])
            r = rng.randrange(mod)
            delete_snapshot_mor(spark, path, f"event_id % {mod} = {r}")
            models[path] = {i: tv for i, tv in m.items() if i % mod != r}
        else:
            if not m:
                continue
            keys = rng.sample(sorted(m), k=min(8, len(m)))
            upd = [(i, f"lineage{step}", round(m[i][1] + 1.0, 6)) for i in keys]
            merge_snapshot_mor(
                spark,
                path,
                spark.createDataFrame(upd, ["event_id", "event_type", "value"]),
                ["event_id"],
            )
            for i, t, v in upd:
                m[i] = (t, v)
        # BOTH lineages checked after every op — cross-talk would show here
        for p2 in (src, dst):
            assert _snap(read_snapshot(spark, p2)) == models[p2], (p2, step)
