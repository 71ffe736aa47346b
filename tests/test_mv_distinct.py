"""KMV sketch-valued distinct-count measures in maintained materialized
views (sinks/materialized_view.py ``distincts=``): inserts must fold
exactly (KMV merge property), retractions that could touch the sketch must
recompute only the danger groups, safe retractions must not read the base,
the estimator must be exact below k, and sketches must roll up losslessly
through mv_rewrite.answer_aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import fxa_amplitude_send_spark.sinks.materialized_view as mv
from fxa_amplitude_send_spark.sinks.materialized_view import (
    _kmv_sketch,
    create_mv,
    kmv_estimate,
    read_mv,
    refresh_mv,
)
from fxa_amplitude_send_spark.sinks.versioned import (
    append_snapshot,
    delete_snapshot,
    read_snapshot,
    write_snapshot,
)
from fxa_amplitude_send_spark.sources import load_table

K = 8  # small k so sf0.001 groups exercise the estimating branch


def _orders(spark, sf_smoke):
    return load_table(spark, sf_smoke, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )


@pytest.fixture()
def base(spark, sf_smoke, tmp_path):
    p = str(tmp_path / "base")
    write_snapshot(_orders(spark, sf_smoke), p)
    return p


def _scratch_sketches(spark, base, keys=("o_orderstatus",), k=K):
    """Ground truth: sketches built from scratch over the base's CURRENT
    content."""
    cur = read_snapshot(spark, base)
    sk = _kmv_sketch(cur, list(keys), "o_custkey", k, "nd_o_custkey")
    return {
        tuple(r[kc] for kc in keys): list(r["nd_o_custkey"])
        for r in sk.collect()
    }


def _view_sketches(spark, mvp, keys=("o_orderstatus",)):
    return {
        tuple(r[kc] for kc in keys): list(r["nd_o_custkey"])
        for r in read_mv(spark, mvp).collect()
    }


def test_create_matches_scratch_and_estimates(spark, base, tmp_path):
    mvp = str(tmp_path / "mv")
    create_mv(
        spark, base, mvp, keys=["o_orderstatus"], sums=["price_c"],
        distincts=["o_custkey"], kmv_k=K,
    )
    assert _view_sketches(spark, mvp) == _scratch_sketches(spark, base)
    # estimator: k=8 on sf0.001 order-status groups is deep in the
    # estimating branch — sanity-band it against the exact count
    got = {
        r["o_orderstatus"]: (r["est"], r["exact"])
        for r in read_mv(spark, mvp)
        .select("o_orderstatus", kmv_estimate("nd_o_custkey", K).alias("est"))
        .join(
            read_snapshot(spark, base)
            .groupBy("o_orderstatus")
            .agg(F.countDistinct("o_custkey").alias("exact")),
            "o_orderstatus",
        )
        .collect()
    }
    for status, (est, exact) in got.items():
        if exact < K:
            assert est == float(exact), status
        else:
            assert 0.3 * exact < est < 3.0 * exact, (status, est, exact)


def test_insert_fold_is_exact(spark, base, tmp_path, sf_smoke):
    """Append-only refresh: merged sketch == from-scratch sketch, the KMV
    merge property made operational."""
    mvp = str(tmp_path / "mv")
    half = _orders(spark, sf_smoke)
    delete_snapshot(spark, base, "o_orderkey % 2 = 1")
    create_mv(
        spark, base, mvp, keys=["o_orderstatus"], sums=["price_c"],
        distincts=["o_custkey"], kmv_k=K,
    )
    append_snapshot(half.filter(F.col("o_orderkey") % 2 == 1), base)
    refresh_mv(spark, mvp)
    assert _view_sketches(spark, mvp) == _scratch_sketches(spark, base)


def test_retraction_recomputes_danger_groups(spark, base, tmp_path):
    """Deleting rows whose hashes sit inside the sketch must trigger the
    danger recompute and land on the from-scratch sketch of the final
    state."""
    mvp = str(tmp_path / "mv")
    create_mv(
        spark, base, mvp, keys=["o_orderstatus"], sums=["price_c"],
        distincts=["o_custkey"], kmv_k=K,
    )
    delete_snapshot(spark, base, "o_custkey % 3 = 0")  # broad: hits sketches
    refresh_mv(spark, mvp)
    assert _view_sketches(spark, mvp) == _scratch_sketches(spark, base)


def test_duplicate_retraction_keeps_member(spark, base, tmp_path):
    """Retracting SOME rows of a value that other rows still support must
    keep the value's hash in the sketch (the recompute sees the survivors)."""
    mvp = str(tmp_path / "mv")
    create_mv(
        spark, base, mvp, keys=["o_orderstatus"], sums=["price_c"],
        distincts=["o_custkey"], kmv_k=K,
    )
    # each customer has many orders; deleting the even orderkeys retracts
    # rows but rarely a customer's LAST row
    delete_snapshot(spark, base, "o_orderkey % 2 = 0")
    refresh_mv(spark, mvp)
    assert _view_sketches(spark, mvp) == _scratch_sketches(spark, base)


def test_safe_retraction_skips_base_read(spark, base, tmp_path, monkeypatch):
    """A retraction whose hashes all sit ABOVE a full sketch's threshold
    folds without touching the base — the cost claim, pinned. Construction:
    group 'lo' holds the K smallest global hashes (its sketch threshold is
    tiny), group 'hi' the rest; deleting from 'hi' only."""
    import pandas as pd

    vals = pd.DataFrame({"v": range(4000)})
    vals["h"] = [
        int(__import__("hashlib").md5(str(v).encode()).hexdigest()[:13], 16)
        for v in vals["v"]
    ]
    vals = vals.sort_values("h").reset_index(drop=True)
    lo_vals = set(vals["v"][:K])          # the K globally-smallest hashes
    hi_vals = list(vals["v"][2 * K:])     # all strictly above the threshold
    df = spark.createDataFrame(
        [("g", int(v)) for v in sorted(lo_vals)]
        + [("g", int(v)) for v in hi_vals[:200]],
        "grp string, v long",
    )
    p = str(tmp_path / "tbase")
    mvp = str(tmp_path / "tmv")
    write_snapshot(df, p)
    create_mv(spark, p, mvp, keys=["grp"], sums=[], distincts=["v"], kmv_k=K)
    sk0 = {r["grp"]: list(r["nd_v"]) for r in read_mv(spark, mvp).collect()}
    assert len(sk0["g"]) == K

    reads = []
    real = mv.read_snapshot
    monkeypatch.setattr(
        mv, "read_snapshot",
        lambda spark, path, version=None: (
            reads.append(path), real(spark, path, version)
        )[1],
    )
    victim = hi_vals[100]
    delete_snapshot(spark, p, f"v = {victim}")
    refresh_mv(spark, mvp)
    assert p not in reads  # fold-only refresh: no danger, no base scan
    assert {r["grp"]: list(r["nd_v"]) for r in read_mv(spark, mvp).collect()} == sk0

    # and the converse: deleting a value whose hash IS in the sketch reads
    # the base exactly once (the danger recompute)
    reads.clear()
    low_victim = sorted(lo_vals)[0]
    delete_snapshot(spark, p, f"v = {low_victim}")
    refresh_mv(spark, mvp)
    assert reads.count(p) == 1
    assert _ground(spark, p) == {
        r["grp"]: list(r["nd_v"]) for r in read_mv(spark, mvp).collect()
    }


def _ground(spark, p):
    cur = read_snapshot(spark, p)
    return {
        r["grp"]: list(r["nd_v"])
        for r in _kmv_sketch(cur, ["grp"], "v", K, "nd_v").collect()
    }


def test_rewrite_rolls_sketches_up_losslessly(spark, base, tmp_path):
    """answer_aggregate(distincts=…) from the finer (status, priority) view
    must produce the SAME sketch per status as a from-scratch build — the
    lossless roll-up that makes sketch-valued cubes worth storing."""
    from fxa_amplitude_send_spark.sinks.mv_rewrite import answer_aggregate

    mvp = str(tmp_path / "fine")
    create_mv(
        spark, base, mvp,
        keys=["o_orderstatus", "o_orderpriority"], sums=["price_c"],
        distincts=["o_custkey"], kmv_k=K,
    )
    out, src = answer_aggregate(
        spark, base, keys=["o_orderstatus"], sums=["price_c"],
        distincts=["o_custkey"], mv_paths=[mvp],
    )
    assert src == mvp
    got = {
        r["o_orderstatus"]: list(r["nd_o_custkey"]) for r in out.collect()
    }
    assert got == {
        k[0]: v for k, v in _scratch_sketches(spark, base).items()
    }
    # a view without the sketch column cannot answer a distincts request
    plain = str(tmp_path / "plain")
    create_mv(spark, base, plain, keys=["o_orderstatus"], sums=["price_c"])
    out2, src2 = answer_aggregate(
        spark, base, keys=["o_orderstatus"], sums=["price_c"],
        distincts=["o_custkey"], mv_paths=[plain], kmv_k=K,
    )
    assert src2 is None  # base fallback, same output shape
    assert {
        r["o_orderstatus"]: list(r["nd_o_custkey"]) for r in out2.collect()
    } == {k[0]: v for k, v in _scratch_sketches(spark, base).items()}
