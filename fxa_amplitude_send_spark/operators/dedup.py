"""Near-duplicate detection operators for LLM-corpus curation, Spark-first.

Four families (SURVEY.md §2B, north-star ops):

* exact / fingerprint dedup — hash aggregate (see plans/llm.py)
* n-gram Jaccard — exact set similarity via inverted-index equi-join
* MinHash + LSH banding — sub-quadratic near-dup candidates
* SimHash — 64-bit fingerprints + hamming-band candidate pairs

Scale notes: every pairwise step is expressed as an equi-join on a derived
key (token, band hash, simhash chunk) so Catalyst plans an ordinary shuffle
join — never a cartesian product. Hot keys (corpus-wide common tokens) are
handled with a document-frequency cut, the standard trick that bounds the
inverted index's posting-list length.

MinHash signatures are computed WITHOUT a shuffle: per-row higher-order
expressions (transform + array_min) over the shingle-hash array, one pass,
fully codegen'd. Only the banding step shuffles, on uniformly-distributed
band hashes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic MinHash parameters (seed fixed: engine results must be stable
# across runs; the driver re-executes queries and compares).
_MERSENNE = (1 << 31) - 1


def _hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k (a, b) pairs for universal hashing h(x) = (a*x + b) mod p."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(k)]


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: F.length(t) > 0)


def shingles_col(text: Column, n: int = 1) -> Column:
    """Distinct n-gram shingles of the whitespace tokens (n=1 → token set)."""
    toks = tokens_col(text)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(gram)


def minhash_signature(shingles: Column, k: int = 64, seed: int = 42) -> Column:
    """k-component MinHash signature as array<long> — per-row, no shuffle.

    sig[i] = min over shingles s of (a_i * xxhash(s) + b_i) mod p.

    Split hybrid: shingle hashing stays JVM-side (xxhash64 has no portable
    Python equivalent — one interpreted eval per shingle), but the k-way
    min-fold runs as a vectorized pandas UDF — Spark's higher-order
    aggregate/zip_with lambdas are evaluated interpreted per element, so
    the fold cost was k·|shingles| lambda dispatches per row (~32M at
    sf0.1); in numpy it is one (k×|shingles|) int64 multiply-add-mod per
    row. Bit-identical: a,b < 2^31 and h < 2^31, so a*h+b < 2^62 never
    overflows int64, and numpy's % matches pmod on non-negatives."""
    params = _hash_params(k, seed)
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    return _minhash_fold_udf(params)(hashes)


def _minhash_fold_udf(params: list[tuple[int, int]]):
    """Vectorized MinHash fold: array<long> shingle hashes → array<long>
    signature. Parameters ship by value in the closure (no repo imports at
    executors); empty shingle sets yield the all-p init vector and NULL
    input propagates NULL, matching the expression fold it replaces."""
    from pyspark.sql.functions import pandas_udf

    _a = [int(a) for a, _ in params]
    _b = [int(b) for _, b in params]
    _p = _MERSENNE

    @pandas_udf("array<long>")
    def fold(hash_arrays: pd.Series) -> pd.Series:
        import numpy as np

        A = np.asarray(_a, dtype=np.int64)[:, None]
        B = np.asarray(_b, dtype=np.int64)[:, None]
        init = [np.full(len(_a), _p, dtype=np.int64)]

        def sig(h):
            if h is None:
                return None
            if len(h) == 0:
                return init[0]
            hv = np.asarray(h, dtype=np.int64)[None, :]
            return ((A * hv + B) % _p).min(axis=1)

        return hash_arrays.map(sig)

    return fold


def band_hashes(sig_col, k: int, bands: int) -> Column:
    """LSH banding: hash each of ``bands`` consecutive k/bands-sized slices
    of a MinHash signature into one 64-bit band key, as an array<long>.
    Shared by the all-pairs path (minhash_lsh_pairs) and the incremental
    ingest index (streaming/corpus_ingest.py) so both sides of a
    stream-vs-history join derive IDENTICAL band keys."""
    rows_per_band = k // bands
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig_col, i * rows_per_band + j + 1)
                        for j in range(rows_per_band)
                    ],
                )
            )
            for i in range(bands)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_n: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding.

    1. signature: per-row expressions (no shuffle)
    2. banding: explode k/bands-sized signature slices, hash each band
    3. candidates: self-equi-join on (band_idx, band_hash) — a plain shuffle
       join; identical bands collide, so expected cost is O(near-dup pairs),
       not O(n²)
    4. estimate: fraction of agreeing signature components (an unbiased
       Jaccard estimator), filtered at ``threshold``

    Output: (doc_a, doc_b, est_jaccard), doc_a < doc_b.
    """
    sig = docs.select(
        F.col(id_col).alias("_id"),
        minhash_signature(shingles_col(F.col(text_col), shingle_n), k, seed).alias("_sig"),
    )

    band_arr = band_hashes(F.col("_sig"), k, bands)
    banded = sig.select(
        "_id",
        "_sig",
        F.posexplode(band_arr).alias("_band", "_bhash"),
    )

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bhash") == F.col("r._bhash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("doc_a"),
            F.col("r._id").alias("doc_b"),
            F.col("l._sig").alias("_siga"),
            F.col("r._sig").alias("_sigb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    est = (
        F.size(
            F.filter(
                F.zip_with("_siga", "_sigb", lambda a, b: a == b), lambda x: x
            )
        ).cast("double")
        / F.lit(float(k))
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    max_doc_freq: float = 1.0,
) -> DataFrame:
    """EXACT n-gram (token-set) Jaccard pairs via inverted-index equi-join.

    jaccard(A,B) = |A∩B| / (|A| + |B| - |A∩B|); the intersection size comes
    from a token-level self-join (shuffle join on token), set sizes from a
    per-doc aggregate. ``max_doc_freq`` < 1 drops corpus-wide tokens (the
    classic posting-list skew cut) before pairing — at web scale the
    stop-token cut is what keeps the join's key distribution sane.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles_col(F.col(text_col))).alias("_tok"),
    )
    if max_doc_freq < 1.0:
        n_docs = docs.count()
        hot = (
            toks.groupBy("_tok")
            .agg(F.countDistinct("_id").alias("_df"))
            .filter(F.col("_df") > int(max_doc_freq * n_docs))
            .select("_tok")
        )
        toks = toks.join(F.broadcast(hot), "_tok", "left_anti")

    # four consumers (both self-join sides + both size lookups) re-derived
    # the scan+tokenize+explode — materialize the posting list once; its
    # volume is what the self-join exchanges anyway. sizes (O(docs)) gets
    # its own checkpoint because it feeds two join legs.
    toks = toks.localCheckpoint(eager=False)
    sizes = (
        toks.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_size"))
        .localCheckpoint(eager=False)
    )

    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a._tok") == F.col("b._tok")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("doc_a"), F.col("_size").alias("_sa"))
    sb = sizes.select(F.col("_id").alias("doc_b"), F.col("_size").alias("_sb"))
    jac = F.col("_inter") / (F.col("_sa") + F.col("_sb") - F.col("_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_col(text: Column, bits: int = 64) -> Column:
    """SimHash fingerprint as one per-row expression chain (no UDF, no
    shuffle): each token votes ±1 on each bit of its xxhash64; the sign of
    the per-bit sum is the fingerprint bit.

    Single traversal of the token array: the accumulator is the whole
    64-slot vote vector, updated via zip_with against a bit-mask literal
    array (the naive form — one aggregate per bit — re-walks the token
    hashes 64×; this walks them once)."""
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit b's mask as a signed long; bit 63 is the sign bit (-2^63).
    masks = F.array(
        *[
            F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")
            for b in range(bits)
        ]
    )
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        # nested lambda: h (outer) stays in scope inside zip_with
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    weighted = F.zip_with(
        votes,
        masks,
        lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation by the 4-chunk pigeonhole trick: split the 64-bit
    fingerprint into 4 16-bit chunks; any pair within hamming distance 3
    must agree on at least one chunk → equi-join per chunk, then exact
    hamming verification with bit_count. Again: joins on derived keys, no
    cartesian."""
    fp = docs.select(
        F.col(id_col).alias("_id"), simhash_col(F.col(text_col)).alias("_fp")
    )
    chunks = fp.select(
        "_id",
        "_fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("_fp", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("_chunk_idx", "_chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._chunk_idx") == F.col("b._chunk_idx"))
            & (F.col("a._chunk") == F.col("b._chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a._fp").alias("_fpa"),
            F.col("b._fp").alias("_fpb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("_fpa").bitwiseXOR(F.col("_fpb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Bucket = sign bits of <v, r_i> for seeded hyperplanes r_i; cosine-close
    vectors collide with high probability. Exact cosine verifies candidates.
    The bucket equi-join replaces the O(n²) similarity matrix.

    Physical strategy: bucket codes come from the same vectorized pandas-UDF
    matmul as the ANN path (one sign-bit matmul per Arrow batch, not an
    interpreted fold per row), and candidate verification never materializes
    the pair relation through an expression join — each bucket group scores
    its own B×B cosine matrix with one numpy matmul and emits only the pairs
    above threshold. Shuffle = one hash partition on bucket id; output =
    surviving pairs. Deterministic: sims rounded to 6 before thresholding,
    pair order normalized to vec_a < vec_b."""
    import pandas as pd

    from .similarity import _lsh_codes_udf

    codes = _lsh_codes_udf(n_planes=n_planes, n_tables=1, seed=seed)
    bucketed = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        codes(F.col(vec_col))[0].alias("_bucket"),
    )
    _threshold = float(threshold)

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pandas as _pd

        if len(pdf) < 2:
            return _pd.DataFrame(
                {"vec_a": _pd.Series(dtype="int64"),
                 "vec_b": _pd.Series(dtype="int64"),
                 "cos_sim": _pd.Series(dtype="float64")}
            )
        pdf = pdf.sort_values("_id", kind="stable")
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        X = np.stack(pdf["_vec"].map(lambda v: np.asarray(v, np.float64)))
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = np.round(X @ X.T, 6)
        ia, ib = np.triu_indices(len(ids), k=1)  # vec_a < vec_b (ids sorted)
        keep = sims[ia, ib] >= _threshold
        return _pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]],
             "cos_sim": sims[ia[keep], ib[keep]]}
        )

    return bucketed.groupBy("_bucket").applyInPandas(
        pairs, schema="vec_a long, vec_b long, cos_sim double"
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    transitive-closure step that turns near-dup PAIRS into dedup CLUSTERS
    (a pair list says a~b and b~c; the component says {a,b,c} are one
    document).

    Each iteration every node adopts min(own label, neighbors' labels),
    then labels pointer-jump (L(v) := L(L(v)) — a label is always a real
    node id, so the indirection is well-defined): the neighbor step moves
    information one hop, the jump halves label-chain depth, and together
    they converge in O(log diameter) rounds (the standard Pregel-CC
    shortcut; large-star/small-star of Kiveris et al. is the same idea with
    edge rewriting). The adjacency carries a SELF-LOOP per node, so the
    neighbor-min aggregate already includes the node's own label — the
    min(own, neigh) step is one join + one aggregate, not a join followed
    by a left-join-with-least. Per round: two shuffle joins (neighbor-min,
    pointer jump) + one hash aggregate.
    The driver loop is inherent to any fixpoint algorithm, but it costs
    exactly ONE job per round: the round's labels are marked
    ``localCheckpoint(eager=False)`` — which truncates the logical plan to
    a LogicalRDD immediately but defers materialization — and the single
    ``agg(sum).collect()`` that reads the convergence scalar is the job
    that computes and pins those blocks. Labels only ever decrease, so an
    unchanged label SUM is exactly a fixpoint: one agg instead of a
    change-count join, and no separate pre-loop action either (the first
    round's sum seeds the comparison). On a real cluster use lazy
    ``checkpoint`` the same way to survive executor loss. (Under AQE the
    lazy checkpoint's ``toRdd`` materializes the round's shuffle stages and
    the collect runs only the result stage — the same total data work
    either way; measured locally the loop is ~0.7 s/round of fixed job
    latency on a 500-node demo graph, and ~9% faster than the previous
    eager-checkpoint + separate-collect form.)

    Output: (id_col, cluster) for every node, cluster = min node id in the
    component; singleton nodes keep their own id.
    """
    # Truncate the edge relation BEFORE symmetrizing: the union's two
    # branches (and, when ``nodes`` is None, the node derivation) each
    # re-plan their input, so an uncheckpointed expensive edge subtree — a
    # similarity join, typically — would execute two or three times just to
    # build adj. O(|E|) rows, lazy: round 1's action materializes it.
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).localCheckpoint(
        eager=False
    )
    sym = e0.union(e0.select(F.col("d").alias("s"), F.col("s").alias("d")))
    if nodes is None:
        nodes = sym.select(F.col("s").alias(id_col)).distinct()
    # self-loops make the neighbor-min include each node's own label (and
    # keep isolated nodes in play) — no separate least(own, neigh) pass
    adj = sym.union(
        nodes.select(F.col(id_col).alias("s"), F.col(id_col).alias("d"))
    )
    # truncate + pin once: the edge relation (often an expensive similarity
    # join) is re-read every round — without this it would re-EXECUTE every
    # round. Lazy: round 1's action materializes it.
    adj = adj.localCheckpoint(eager=False)
    labels = nodes.select(
        F.col(id_col), F.col(id_col).cast("long").alias("cluster")
    ).localCheckpoint(eager=False)
    prev_sum = None
    for _ in range(max_iter):
        stepped = (
            adj.join(labels, adj["s"] == labels[id_col])
            .groupBy(F.col("d").alias(id_col))
            .agg(F.min("cluster").alias("cluster"))
        )
        # pointer jump: follow the label one more level (L(L(v)))
        parent = stepped.select(
            F.col(id_col).alias("_pid"), F.col("cluster").alias("_pcluster")
        )
        labels_new = stepped.join(
            parent,
            stepped["cluster"] == parent["_pid"],
            "left",
        ).select(
            F.col(id_col),
            F.coalesce(F.col("_pcluster"), F.col("cluster")).alias("cluster"),
        ).localCheckpoint(eager=False)
        # the ONE action of the round: computes + pins the checkpoint blocks
        # AND returns the convergence scalar
        new_sum = labels_new.agg(F.sum("cluster")).collect()[0][0]
        labels = labels_new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
