"""Distributed PCA over an embedding column — the dimensionality-reduction
step an embedding pipeline runs before ANN indexing or clustering (FAISS's
OPQ/PCA pre-transform, whitening before cosine retrieval).

Spark-first split of the work:
  1. the d×d covariance accumulates DISTRIBUTED — each Arrow batch
     contributes one partial (count, Σx, flattened ΣxᵀX) row via
     ``mapInPandas`` (a single numpy matmul per batch), and the partials
     merge in one tiny aggregate: shuffle volume is
     O(partitions × d²) floats, independent of row count;
  2. the d×d eigendecomposition runs on the DRIVER — it is O(d³) on a
     64×64 matrix, far below any cluster-worthy threshold (same bounded
     driver step as IVF's sampled k-means);
  3. the projection back onto the corpus is one broadcast matmul per
     Arrow batch (components ship in the UDF closure).

Reference scope: engine breadth beyond the 233-line reference pipeline;
the method is textbook (eigendecomposition of the sample covariance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_accumulate(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[int, list[float], list[list[float]]]:
    """One pass: (n, mean, covariance) of the vector column. The per-batch
    partial is one row (count, [Σx ‖ vec(ΣXᵀX)]); the elementwise merge of
    partials runs DISTRIBUTED (posexplode → groupBy(position) → sum), so
    the driver only ever receives d + d² scalars regardless of partition
    count."""

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, np.float64)))
            # count rides as the last slot so ONE merged stream carries
            # everything (no second pass over the corpus for n)
            yield pd.DataFrame(
                {
                    "acc": [
                        X.sum(axis=0).tolist()
                        + (X.T @ X).ravel().tolist()
                        + [float(len(X))]
                    ],
                }
            )

    part = emb.select(vec_col).mapInPandas(partials, schema="acc array<double>")
    merged = (
        part.select(F.posexplode("acc").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    import numpy as np

    acc = np.zeros(len(merged))
    for r in merged:
        acc[r["pos"]] = r["v"]
    n = int(acc[-1])
    acc = acc[:-1]
    # d from d + d² = len(acc)
    d = int(round((-1 + (1 + 4 * len(acc)) ** 0.5) / 2))
    s, ss = acc[:d], acc[d:]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean.tolist(), cov.tolist()


def train_pca(
    emb: DataFrame, n_components: int, vec_col: str = "embedding"
) -> tuple[list[float], list[list[float]], list[float]]:
    """(mean, components[k][d], explained_variance_ratio[k]) — components
    are unit eigenvectors of the covariance, descending eigenvalue order,
    sign-normalized (largest-|coord| positive) for determinism."""
    import numpy as np

    _, mean, cov = covariance_accumulate(emb, vec_col=vec_col)
    vals, vecs = np.linalg.eigh(np.asarray(cov))  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T  # (k, d)
    for i in range(len(comps)):  # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    ratio = (vals[order] / max(vals.sum(), 1e-300)).tolist()
    return mean, comps.tolist(), ratio


def project_pca(
    emb: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project every vector onto the components: (x − mean) @ compsᵀ, one
    numpy matmul per Arrow batch, components shipped by value."""
    _mean = [float(x) for x in mean]
    _comps = [[float(x) for x in row] for row in components]

    def proj(batches):
        import numpy as np
        import pandas as pd

        M = np.asarray(_mean)
        C = np.asarray(_comps)  # (k, d)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, np.float64)))
            Y = (X - M) @ C.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: [row.tolist() for row in Y]}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        proj, schema=f"{id_col} long, {out_col} array<double>"
    )
