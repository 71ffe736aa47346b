"""Product quantization (PQ) for embedding compression.

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search") splits
each d-dim vector into m subvectors and vector-quantizes each subspace with
its own small codebook; a vector is stored as m one-byte codes instead of
d floats — the standard 100 TB embedding-store compression (64 floats →
4 bytes here, 64×).

Same split as IVF (operators/similarity.py): codebooks train driver-side on
a BOUNDED deterministic sample — training is O(m·k·d·sample), independent of
corpus size — while the O(N) encode pass runs fully distributed as one
vectorized pandas UDF (per Arrow batch: m small matmuls). Codebooks travel
by value in the closure, so executors need no repo imports.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_pq_codebooks(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    n_iter: int = 8,
    sample_n: int = 512,
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks of k centroids each (L2 k-means).

    Deterministic: fixed lowest-id sample, first-k init per subspace,
    argmin ties break to the lowest code. Returns [m][k][d/m] floats."""
    import numpy as np

    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        C = S[:k].copy()
        for _ in range(n_iter):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties -> lowest code
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C.tolist())
    return books


def encode_pq(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    err_col: str = "recon_err",
) -> DataFrame:
    """Attach each vector's PQ code (array<int>, one code per subspace) and
    the reconstruction error ||x - decode(code)||₂ rounded to 6 decimals.

    One vectorized pandas UDF returning a struct — the encode pass is
    embarrassingly parallel, no shuffle; at 100 TB it is scan-bound."""
    from pyspark.sql.functions import pandas_udf

    _books = [[list(map(float, c)) for c in book] for book in codebooks]

    @pandas_udf("struct<codes: array<int>, err: double>")
    def pq(vecs: pd.Series) -> pd.DataFrame:
        import numpy as np
        import pandas as _pd

        B = [np.array(b, dtype=np.float64) for b in _books]
        sub = B[0].shape[1]
        X = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        codes = np.empty((len(X), len(B)), dtype=np.int32)
        err2 = np.zeros(len(X), dtype=np.float64)
        for j, C in enumerate(B):
            S = X[:, j * sub : (j + 1) * sub]
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
            err2 += d2[np.arange(len(X)), codes[:, j]]
        return _pd.DataFrame(
            {"codes": list(codes), "err": np.round(np.sqrt(err2), 6)}
        )

    staged = emb.withColumn("_pq", pq(F.col(vec_col)))
    return staged.withColumn(code_col, F.col("_pq.codes")).withColumn(
        err_col, F.col("_pq.err")
    ).drop("_pq")
