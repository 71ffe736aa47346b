"""Similarity search over embedding columns: exact brute-force baseline and
LSH-bucketed approximate path.

Scale design: brute-force top-k against ONE query is a broadcast + linear
scan + TakeOrderedAndProject — optimal as-is. For many-query / all-pairs
workloads the hyperplane-LSH bucket join turns the O(n·m) similarity matrix
into an equi-join on bucket ids; recall is tuned by n_planes (bucket width)
and multi-probe (neighboring buckets).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_col


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Seeded deterministic hyperplanes (no numpy dependency at executor)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_bucket_col(
    vec: Column, dim: int = 64, n_planes: int = 8, seed: int = 7
) -> Column:
    """LSH bucket id = integer of sign bits of <vec, r_i>, pure expressions."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, plane_lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k of ``emb`` against a single-row ``query`` frame."""
    joined = emb.crossJoin(F.broadcast(query))
    sim = cosine_similarity_col(F.col(vec_col), F.col(query_vec_col))
    return (
        joined.select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def brute_force_topk_many(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k for MANY queries: broadcast the (bounded) query
    sample against the corpus, exact cosine, window top-k per query. O(n·q)
    — the recall ground truth for the approximate paths, run on a sampled
    query set (the standard ANN evaluation protocol), not a serving path."""
    from pyspark.sql import Window

    joined = emb.select(
        F.col(id_col).alias("_eid"), F.col(vec_col).alias("_evec")
    ).crossJoin(F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qvec")
    ))).filter(F.col("_eid") != F.col("query_id"))
    sim = cosine_similarity_col(F.col("_evec"), F.col("_qvec"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        joined.select(
            "query_id", F.col("_eid").alias(id_col), F.round(sim, 6).alias("cos_sim")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cos_sim", "rnk")
    )


def recall_at_k(approx_topk: DataFrame, exact_topk: DataFrame, k: int) -> DataFrame:
    """recall@k of an approximate top-k result against the exact ground
    truth: |approx ∩ exact| / k averaged over queries. Both inputs carry
    (query_id, vec_id). A semi-join + two aggregates — no collect."""
    hits = approx_topk.select("query_id", "vec_id").join(
        exact_topk.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    per_query = (
        exact_topk.select("query_id").distinct()
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits")),
            "query_id",
            "left",
        )
        .select("query_id", F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"))
    )
    return per_query.agg(
        F.round(F.avg(F.col("n_hits") / F.lit(float(k))), 4).alias("recall_at_k"),
        F.count(F.lit(1)).alias("n_queries"),
    )


def ann_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    n_planes: int = 6,
    n_tables: int = 1,
    multiprobe: bool = False,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k neighbors for MANY queries at once.

    Both sides are bucketed by the same seeded hyperplanes; candidates come
    from the bucket equi-join; exact cosine re-ranks within buckets and a
    ranking window takes k per query. Sub-linear candidate generation,
    deterministic output (seeded planes, total ordering with id tiebreak).

    Recall is tuned by three standard LSH knobs (Indyk-Motwani multi-table,
    Lv et al. multi-probe):

    * ``n_planes`` — bits per code: more planes → smaller buckets → fewer
      candidates and lower per-table recall.
    * ``n_tables`` — independent hash tables (different seeds); a neighbor
      is a candidate if it collides in ANY table:
      recall ≈ 1-(1-p^b)^L for per-bit agreement p.
    * ``multiprobe`` — queries also probe every bucket at Hamming distance
      1 from their code (flip each bit), catching neighbors that disagree
      on exactly one plane without paying for another table.

    Plan shape stays one equi-join regardless of the knobs: the corpus side
    explodes to (table, bucket) — n_tables rows per vector — and the query
    side to (table, probe_bucket); both join on the composite key, then
    candidate pairs are deduped before the exact re-rank. No cross join at
    any setting."""
    from pyspark.sql import Window

    def codes(vec: Column, probe: bool) -> Column:
        """array of (table_idx, bucket) structs — probe=True adds the
        Hamming-1 neighborhood of each table's code."""
        entries = []
        for t in range(n_tables):
            code = hyperplane_bucket_col(
                vec, dim=dim, n_planes=n_planes, seed=seed + 9973 * t
            )
            buckets = [code]
            if probe:
                buckets += [code.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
            entries += [
                F.struct(F.lit(t).alias("t"), b.alias("b")) for b in buckets
            ]
        return F.array(*entries)

    e = emb.select(
        F.col(id_col).alias("_eid"),
        F.col(vec_col).alias("_evec"),
        F.explode(codes(F.col(vec_col), probe=False)).alias("_tb"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qvec"),
        F.explode(codes(F.col(query_vec_col), probe=multiprobe)).alias("_tb"),
    )
    cand = (
        e.join(q, e["_tb"] == q["_tb"])
        .filter(F.col("_eid") != F.col("query_id"))
        .dropDuplicates(["query_id", "_eid"])
    )
    sim = cosine_similarity_col(F.col("_evec"), F.col("_qvec"))
    scored = cand.select(
        "query_id", F.col("_eid").alias(id_col), F.round(sim, 6).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cos_sim", "rnk")
    )


def knn_label_vote(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    **kwargs,
) -> DataFrame:
    """Majority-label classification from the ANN top-k (ground-truth demo)."""
    topk = ann_bucketed_topk(emb, queries, k=k, **kwargs)
    labeled = topk.join(
        emb.select(F.col("vec_id"), F.col("label")), "vec_id"
    )
    votes = labeled.groupBy("query_id", "label").agg(F.count(F.lit(1)).alias("votes"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label"))
    return (
        votes.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


def train_ivf_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iter: int = 5,
    sample_n: int = 512,
) -> list[list[float]]:
    """Train an IVF coarse quantizer: spherical k-means on a BOUNDED,
    deterministic sample (lowest ids). Standard IVF practice — the training
    set is O(centroids), tiny vs the corpus, so collecting it to the driver
    is by design; the O(N) assignment pass stays distributed (see
    assign_ivf_cells). Deterministic: fixed sample, first-k init, argmax
    ties break to the lowest centroid index."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_centroids].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C.tolist()


def assign_ivf_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    n_probe: int = 1,
    out_col: str = "cell",
) -> DataFrame:
    """Attach each vector's n_probe nearest IVF cells as an array<int>.

    One vectorized pandas UDF: per Arrow batch a single (B×d)@(d×k) matmul
    — the O(N·k·d) assignment runs fully distributed, no shuffle. The
    centroid matrix travels by value in the closure (small: k×d floats), so
    executors need no repo imports."""
    from pyspark.sql.functions import pandas_udf

    _centroids = [list(map(float, c)) for c in centroids]
    _n_probe = int(n_probe)

    @pandas_udf("array<int>")
    def nearest_cells(vecs: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as _pd

        C = np.array(_centroids, dtype=np.float64)
        X = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        # argsort desc, stable → ties to lowest centroid index
        order = np.argsort(-sims, axis=1, kind="stable")[:, :_n_probe]
        return _pd.Series(list(order.astype("int32")))

    return emb.withColumn(out_col, nearest_cells(F.col(vec_col)))


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    cell; each query probes its n_probe nearest cells; candidates pair via
    an equi-join on cell id (never a cartesian), exact cosine re-ranks.

    vs hyperplane LSH (ann_bucketed_topk): cells are LEARNED from the data,
    so clustered corpora get balanced partitions and higher recall at the
    same candidate budget. At 100 TB the cell column is a natural partition/
    cluster key for the stored index (write once, probe by partition
    pruning)."""
    from pyspark.sql import Window

    e = assign_ivf_cells(emb, centroids, vec_col=vec_col, n_probe=1).select(
        F.col(id_col).alias("_eid"),
        F.col(vec_col).alias("_evec"),
        F.col("cell")[0].alias("_cell"),
    )
    q = assign_ivf_cells(
        queries, centroids, vec_col=query_vec_col, n_probe=n_probe
    ).select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qvec"),
        F.explode("cell").alias("_cell"),
    )
    cand = e.join(q, "_cell").filter(F.col("_eid") != F.col("query_id"))
    sim = cosine_similarity_col(F.col("_evec"), F.col("_qvec"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        cand.select(
            "query_id", F.col("_eid").alias("vec_id"), F.round(sim, 6).alias("cos_sim")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
