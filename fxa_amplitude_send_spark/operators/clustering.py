"""Distributed k-means (Lloyd's algorithm) over an embedding column.

Spark-first shape for iterative clustering at corpus scale:

- **Assignment is a pure column expression.** The k current centroids are
  driver-side literals folded into ONE projection: per row, k squared-L2
  distances via ``F.aggregate(F.zip_with(...))`` (JVM codegen, no Python),
  argmin via ``array_position(array_min)``. No join, no shuffle for the
  assign step — the centroid state is O(k·d) and rides in the plan.
- **The update step is one mergeable aggregate per round**:
  posexplode(embedding) → groupBy(cluster, dim) → (sum, count) → k·d cells
  collected to the driver (k=8, d=64 → 512 scalars). This is the same
  bounded-driver-state discipline as the trained classifier
  (operators/classifier.py) and PCA (operators/decomposition.py): rounds
  × one Spark job, driver state O(k·d), data never collected.
- **Deterministic init**: the k vectors with the smallest Fibonacci hash of
  vec_id (the bottom-k-by-hash uniform-sample trick, plans/training.py) —
  reproducible run-to-run and engine-to-engine, unlike random init.

At 100 TB the assign+aggregate pass is scan-bound per round; empty
clusters keep their previous centroid (the standard Lloyd fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KMEANS_MULT = 2246822519  # reuse the stratified-family odd multiplier
_MOD = 4294967296
_PREMOD = 2147483648


def _dist_sq(vec_col, centroid: list[float]):
    """Squared L2 distance between an array column and a literal centroid,
    evaluated JVM-side: zip_with difference, aggregate of squares."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_cols(vec_col, centroids: list[list[float]]):
    """(cluster, dist_sq) columns for the nearest of ``centroids``.
    Ties break to the lowest cluster id (array_position returns the first
    match), keeping assignment deterministic."""
    dists = F.array(*[_dist_sq(vec_col, c) for c in centroids])
    best = F.array_min(dists)
    # array_position is 1-based; cluster ids are 0-based
    return (F.array_position(dists, best) - 1).cast("int"), best


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[float]]:
    """Train k-means; returns (centroids, per-round inertia history).

    Each round costs exactly ONE Spark job: the (cluster, dim) moment
    aggregate also carries sum(dist²) per cell, so the round's inertia is
    recovered as Σ cells / d (each row's distance is replicated across its
    d exploded dims — division by the constant d is exact in binary for
    power-of-two d and a ~1-ULP rescale otherwise). The inertia history is
    the convergence audit trail — Lloyd's guarantees it non-increasing,
    which the tests assert."""
    seeds = (
        emb.select(
            vec_col,
            (
                (F.col(id_col).cast("long") % F.lit(_PREMOD)) * F.lit(_KMEANS_MULT)
                % F.lit(_MOD)
            ).alias("_h"),
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in seeds]
    d_dims = len(centroids[0])
    history: list[float] = []
    for _ in range(rounds):
        cluster, dist = _assign_cols(F.col(vec_col), centroids)
        assigned = emb.select(
            cluster.alias("cluster"), dist.alias("d2"), F.col(vec_col).alias("v")
        )
        moments = (
            assigned.select("cluster", "d2", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum("x").alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.sum("d2").alias("s2"),
            )
            .collect()
        )
        history.append(float(sum(r["s2"] for r in moments)) / d_dims)
        new_c = [list(c) for c in centroids]  # empty clusters keep position
        by_cluster: dict[int, dict[int, tuple[float, int]]] = {}
        for r in moments:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (r["s"], r["n"])
        for cid, dims in by_cluster.items():
            new_c[cid] = [dims[d][0] / dims[d][1] for d in sorted(dims)]
        centroids = new_c
    return centroids, history


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final assignment under trained centroids: (id, cluster, dist_sq)."""
    cluster, dist = _assign_cols(F.col(vec_col), centroids)
    return emb.select(
        F.col(id_col), cluster.alias("cluster"), dist.alias("dist_sq")
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, q) with every coordinate snapped to the integer micro-grid
    round(x * scale) — the float→exact bridge that lets a Lloyd round be
    hash-gated across engines: the widening float→double cast and the
    single multiply are correctly rounded (bit-identical everywhere), and
    from the snap onward every distance, argmin and moment sum is BIGINT
    arithmetic with no accumulation-order sensitivity."""
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(float(scale))).cast("long"),
    )
    return emb.select(F.col(id_col), q.alias("q"))


def _dist2_int(qcol, centroid: list[int]):
    """Squared L2 distance between an integer-grid array column and a
    literal integer centroid — BIGINT-exact (|coord| ≤ ~2e6 over 64 dims
    keeps the sum far below 2^63)."""
    lit = F.array(*[F.lit(int(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(qcol, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def lloyd_round_exact(embq: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """ONE Lloyd round under FROZEN integer-grid centroids, every output
    cell exact: assign each vector to its nearest centroid (BIGINT squared
    L2, ties to the lowest cluster id) and emit the (cluster, dim) moment
    aggregate — n_vectors, coordinate sum, and the cluster's inertia
    (Σ dist², replicated across its dims like kmeans_train's s2 cells).
    This is the assign+update step of kmeans_train with the floats
    removed, so the SAME physical shape that trains the learned model is
    hash-gateable against ANSI SQL: k literal centroids folded into one
    JVM projection (no join, no Python), posexplode, one mergeable
    groupBy(cluster, dim) with map-side combine → k·d output cells.
    The new centroid is sum_q/n_vectors — left as the exact (numerator,
    denominator) pair rather than a division, so no float ever appears."""
    dists = F.array(*[_dist2_int(F.col("q"), c) for c in centroids])
    best = F.array_min(dists)
    cluster = (F.array_position(dists, best) - 1).cast("long")
    assigned = embq.select(
        cluster.alias("cluster"), best.alias("d2"), F.col("q")
    )
    return (
        assigned.select("cluster", "d2", F.posexplode("q").alias("pos", "x"))
        .select(
            "cluster", "d2", "x", (F.col("pos") + 1).cast("long").alias("dim")
        )
        .groupBy("cluster", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("x").alias("sum_q"),
            F.sum("d2").alias("inertia"),
        )
    )
