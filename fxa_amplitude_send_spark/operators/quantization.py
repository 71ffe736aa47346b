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


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 2,
    refine_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    corpus_cells: DataFrame | None = None,
    query_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: IVF cells route candidates, PQ codes score
    them — the index layout behind billion-vector ANN (FAISS IndexIVFPQ;
    this is the ``by_residual=false`` variant: codes encode raw vectors, so
    the same stored codes serve both compression and search).

    Asymmetric distance computation (ADC): the query stays full-precision;
    per (query, subspace) a k-entry lookup table of inner products against
    the codebook is built once, and each candidate's score is m table
    lookups instead of a d-dim dot product. cosine(q, recon) =
    Σ_j LUT_j[code_j] / sqrt(Σ_j ||B_j[code_j]||²) for unit-norm q —
    subspaces concatenate orthogonally, so the reconstruction norm is a
    per-subspace table sum too.

    ADC ranks coarsely (16 codewords per subspace is a blunt ruler —
    deliberately so, that's the compression), so the shortlist is REFINED:
    each cell emits its ADC top-(refine_factor·k), and only those few rows
    join back to full-precision vectors for an exact-cosine rerank (the
    FAISS IndexRefineFlat pattern). The expensive exact math touches
    cells·q·refine_factor·k rows, never the corpus.

    Physical strategy: corpus candidates never leave their cell — cogrouped
    applyInPandas scores each (cell × its probing queries) block with numpy
    table lookups; candidate I/O is m bytes of codes per vector, not d
    floats — the point of PQ at 100 TB. The refine join is an equi-join on
    vec_id of a tiny shortlist against the (cluster-pruned at scale)
    vector store, plus a broadcast of the bounded query set."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .similarity import assign_ivf_cells

    # corpus_cells shares one O(N·k·d) assignment pass across IVF-family
    # paths run under the same quantizer (see similarity.ivf_topk)
    e = (
        corpus_cells
        if corpus_cells is not None
        else assign_ivf_cells(emb, centroids, vec_col=vec_col, n_probe=1)
    )
    e = encode_pq(e, codebooks, vec_col=vec_col)
    e = e.select(
        F.col(id_col).alias("_eid"),
        F.col("pq_code").alias("_codes"),
        F.col("cell")[0].cast("long").alias("_b"),
    )
    # query_cells: one shared query-side assignment pass across IVF-family
    # paths under the same quantizer + n_probe (see similarity.ivf_topk)
    if query_cells is None:
        query_cells = assign_ivf_cells(
            queries, centroids, vec_col=query_vec_col, n_probe=n_probe
        )
    q = (
        query_cells
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qvec"),
            F.explode("cell").alias("_b0"),
        )
        .select("query_id", "_qvec", F.col("_b0").cast("long").alias("_b"))
    )

    _books = [[list(map(float, c)) for c in book] for book in codebooks]
    _k = int(k) * int(refine_factor)  # ADC emits the refine shortlist

    def score(key, cdf: pd.DataFrame, qdf: pd.DataFrame):
        import numpy as np
        import pandas as _pd

        empty = _pd.DataFrame(
            {"query_id": _pd.Series(dtype="int64"),
             "vec_id": _pd.Series(dtype="int64"),
             "cos_sim_pq": _pd.Series(dtype="float64")}
        )
        if cdf.empty or qdf.empty:
            return empty
        B = [np.array(b, dtype=np.float64) for b in _books]  # m × (k_pq, sub)
        sub = B[0].shape[1]
        norms2 = np.stack([(Bj**2).sum(axis=1) for Bj in B])  # (m, k_pq)
        cdf = cdf.sort_values("_eid", kind="stable")
        eids = cdf["_eid"].to_numpy(dtype=np.int64)
        codes = np.stack(cdf["_codes"].map(np.asarray))  # (n, m)
        recon_norm = np.sqrt(
            np.maximum(norms2[np.arange(len(B))[:, None], codes.T].sum(axis=0), 1e-24)
        )  # (n,)
        qids = qdf["query_id"].to_numpy(dtype=np.int64)
        Q = np.stack(qdf["_qvec"].map(lambda v: np.asarray(v, np.float64)))
        Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        out_q, out_e, out_s = [], [], []
        for qi, qid in enumerate(qids):
            # LUT: per subspace, inner product of q_j with every codeword
            lut = np.stack(
                [B[j] @ Q[qi, j * sub : (j + 1) * sub] for j in range(len(B))]
            )  # (m, k_pq)
            ip = lut[np.arange(len(B))[:, None], codes.T].sum(axis=0)  # (n,)
            sims = np.round(ip / recon_norm, 6)
            sims[eids == qid] = -np.inf  # self-match
            kk = min(_k, len(eids))
            top = np.argsort(-sims, kind="stable")[:kk]
            keep = sims[top] > -np.inf
            out_q.append(np.full(keep.sum(), qid))
            out_e.append(eids[top][keep])
            out_s.append(sims[top][keep])
        if not out_q:
            return empty
        return _pd.DataFrame(
            {"query_id": np.concatenate(out_q),
             "vec_id": np.concatenate(out_e),
             "cos_sim_pq": np.concatenate(out_s)}
        )

    scored = e.groupBy("_b").cogroup(q.groupBy("_b")).applyInPandas(
        score, schema="query_id long, vec_id long, cos_sim_pq double"
    )
    shortlist = scored.dropDuplicates(["query_id", "vec_id"])

    # exact refine: full-precision cosine on the shortlist only
    from ..functions.vectors import cosine_similarity_col

    qvecs = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
    )
    refined = (
        shortlist.join(emb.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                cosine_similarity_col(F.col(vec_col), F.col("_qv")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return refined.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
