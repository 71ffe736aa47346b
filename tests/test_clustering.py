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
