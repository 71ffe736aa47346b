"""Distributed k-means: equivalence with an independent numpy twin,
Lloyd's monotone-inertia invariant, determinism of init and assignment."""

from __future__ import annotations

import numpy as np
import pytest

from fxa_amplitude_send_spark.operators.clustering import (
    _KMEANS_MULT,
    _MOD,
    _PREMOD,
    kmeans_assign,
    kmeans_train,
)
from fxa_amplitude_send_spark.sources import load_table


@pytest.fixture()
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings")


def _numpy_twin(ids, X, k, rounds):
    h = (ids.astype(np.int64) % _PREMOD) * _KMEANS_MULT % _MOD
    C = X[np.argsort(h)[:k]].astype(np.float64).copy()
    hist = []
    for _ in range(rounds):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        hist.append(d.min(axis=1).sum())
        for j in range(k):
            if (a == j).any():
                C[j] = X[a == j].mean(axis=0)
    return C, hist, a


def test_kmeans_matches_numpy_twin(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    C_np, hist_np, a_np = _numpy_twin(ids, X, k=8, rounds=4)

    C_sp, hist_sp = kmeans_train(emb, k=8, rounds=4)
    assert np.allclose(np.array(C_sp), C_np, atol=1e-6)
    assert np.allclose(np.array(hist_sp), np.array(hist_np), rtol=1e-7)

    # final assignment under the FINAL centroids (the training-loop `a_np`
    # is the pre-update assignment of the last round)
    d_final = ((X[:, None, :] - C_np[None, :, :]) ** 2).sum(axis=2)
    a_final = d_final.argmin(axis=1)
    assigned = {
        r.vec_id: r.cluster for r in kmeans_assign(emb, C_sp).collect()
    }
    agree = sum(assigned[i] == a for i, a in zip(ids, a_final))
    assert agree / len(ids) >= 0.998  # float-order ULPs may flip a tie


def test_kmeans_inertia_monotone_and_deterministic(spark, emb):
    _, h1 = kmeans_train(emb, k=4, rounds=5)
    _, h2 = kmeans_train(emb, k=4, rounds=5)
    assert all(b <= a + 1e-6 for a, b in zip(h1, h1[1:]))
    assert h1 == h2  # same init, same data -> identical audit trail


def test_lloyd_round_exact_matches_integer_numpy_twin(spark, emb):
    """lloyd_round_exact's (cluster, dim) moment cells — n, Σq, inertia —
    must equal an independent numpy computation on the SAME integer grid
    exactly (not approximately): the whole point of the quantized round is
    that nothing after the snap is float, so any engine disagreement is a
    logic bug, never accumulation order."""
    from fxa_amplitude_send_spark.operators.clustering import (
        lloyd_round_exact,
        quantize_embeddings,
    )

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    Q = np.round(np.array([r.embedding for r in rows], dtype=np.float64) * 1e6
                 ).astype(np.int64)
    C = Q[ids < 8][np.argsort(ids[ids < 8])]  # vec_id < 8, in id order
    d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)  # ties to lowest cluster id, like array_position
    want = {}
    for cid in range(8):
        mask = a == cid
        if not mask.any():
            continue
        inertia = int(d[mask, cid].sum())
        for dim in range(Q.shape[1]):
            want[(cid, dim + 1)] = (
                int(mask.sum()), int(Q[mask, dim].sum()), inertia)

    embq = quantize_embeddings(emb)
    cents = [list(r["q"]) for r in
             embq.filter(embq.vec_id < 8).orderBy("vec_id").collect()]
    got = {
        (r.cluster, r.dim): (r.n_vectors, r.sum_q, r.inertia)
        for r in lloyd_round_exact(embq, cents).collect()
    }
    assert got == want
