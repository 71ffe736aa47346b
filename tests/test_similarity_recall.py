"""ANN quality gate (VERDICT r1 item 3): the approximate similarity paths
must actually find good neighbors, not just run deterministically.

recall@5 of both approximate paths vs the exact brute-force ground truth is
floor-asserted at sf0.01. The synthetic embeddings are uniform random on the
sphere — LSH's worst case — so the tuned knobs (10 tables + Hamming-1
multi-probe; 10/16 IVF probes) are deliberately aggressive; see
plans/llm.py ANN_PARAMS for the measured numbers and the tune-down note for
clustered real-world corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fxa_amplitude_send_spark.operators.similarity import (
    ann_bucketed_topk,
    brute_force_topk_many,
    ivf_topk,
    recall_at_k,
    train_ivf_centroids,
)
from fxa_amplitude_send_spark.plans.llm import ANN_PARAMS, IVF_PARAMS
from fxa_amplitude_send_spark.sources.tables import load_table

RECALL_FLOOR = 0.8
K = 5


@pytest.fixture(scope="module")
def ground_truth(spark, sf_correctness):
    emb = load_table(spark, sf_correctness, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = brute_force_topk_many(emb, queries, k=K).cache()
    exact.count()
    yield emb, queries, exact
    exact.unpersist()


def test_lsh_recall_floor(ground_truth):
    emb, queries, exact = ground_truth
    approx = ann_bucketed_topk(emb, queries, k=K, **ANN_PARAMS)
    row = recall_at_k(approx, exact, K).collect()[0]
    assert row.n_queries == 10
    assert row.recall_at_k >= RECALL_FLOOR, f"LSH recall@{K}={row.recall_at_k}"


def test_ivf_recall_floor(ground_truth):
    emb, queries, exact = ground_truth
    centroids = train_ivf_centroids(
        emb, n_centroids=IVF_PARAMS["n_centroids"], n_iter=5, sample_n=512
    )
    approx = ivf_topk(emb, queries, centroids, k=K, n_probe=IVF_PARAMS["n_probe"])
    row = recall_at_k(approx, exact, K).collect()[0]
    assert row.recall_at_k >= RECALL_FLOOR, f"IVF recall@{K}={row.recall_at_k}"


def test_ivfpq_recall_floor(ground_truth):
    """PQ-compressed candidates + exact refine must not lose recall vs the
    cell routing that bounds it (FAISS refine pattern)."""
    from fxa_amplitude_send_spark.operators.quantization import (
        ivfpq_topk,
        train_pq_codebooks,
    )

    emb, queries, exact = ground_truth
    centroids = train_ivf_centroids(
        emb, n_centroids=IVF_PARAMS["n_centroids"], n_iter=5, sample_n=512
    )
    books = train_pq_codebooks(emb, m=4, k=16)
    approx = ivfpq_topk(
        emb, queries, centroids, books, k=K, n_probe=IVF_PARAMS["n_probe"]
    )
    row = recall_at_k(approx, exact, K).collect()[0]
    assert row.recall_at_k >= RECALL_FLOOR, f"IVFPQ recall@{K}={row.recall_at_k}"


def test_registered_recall_query_reports_all_paths(spark, sf_correctness):
    from fxa_amplitude_send_spark.plans import all_queries

    df = all_queries()["llm_sim_recall"](spark, sf_correctness)
    rows = {r.path: r.recall_at_k for r in df.collect()}
    assert set(rows) == {"lsh_multiprobe", "ivf", "ivfpq", "ivf_served"}
    assert all(v >= RECALL_FLOOR for v in rows.values()), rows
    # the persisted serving index must not lose recall vs on-the-fly IVF
    assert rows["ivf_served"] >= 0.86, rows
    assert rows["ivf_served"] == rows["ivf"], rows


def test_single_table_recall_collapses_on_uniform_data(ground_truth):
    """Sanity check that the recall metric discriminates: one 6-bit table
    without probing must score far below the multi-table configuration."""
    emb, queries, exact = ground_truth
    approx = ann_bucketed_topk(
        emb, queries, k=K, n_planes=6, n_tables=1, multiprobe=False
    )
    row = recall_at_k(approx, exact, K).collect()[0]
    assert row.recall_at_k < 0.5


def test_vectorized_lsh_codes_match_expression_fold(spark, sf_correctness):
    """The batched sign-bit matmul encoder must reproduce the documented
    expression-fold encoder bit-for-bit (same seeded planes, same packing) —
    the parity contract that justified replacing the fold in the hot path."""
    from fxa_amplitude_send_spark.operators.similarity import (
        _lsh_codes_udf,
        hyperplane_bucket_col,
    )

    emb = load_table(spark, sf_correctness, "embeddings").limit(200)
    both = emb.select(
        hyperplane_bucket_col(F.col("embedding"), n_planes=8, seed=7).alias("fold"),
        _lsh_codes_udf(n_planes=8, n_tables=1, seed=7)(F.col("embedding"))[0].alias(
            "udf"
        ),
    )
    assert both.filter(F.col("fold") != F.col("udf")).count() == 0


def test_dedup_quality_floors(spark, sf_correctness):
    """Sketch-dedup analogue of the ANN gate: MinHash+LSH candidate pairs
    must hit pair-level precision/recall floors against exact Jaccard ground
    truth. Recall loss concentrates at the 0.8 threshold boundary (estimator
    variance with k=64 components), so the floor sits below the ANN one."""
    from fxa_amplitude_send_spark.plans import all_queries

    row = all_queries()["llm_dedup_quality"](spark, sf_correctness).collect()[0]
    assert row.n_truth > 1000, "ground-truth pair set unexpectedly small"
    assert row.precision >= 0.85, f"precision={row.precision}"
    assert row.recall >= 0.70, f"recall={row.recall}"


def test_ivf_served_equals_on_the_fly(spark, sf_smoke):
    """The persisted-bucketed-index serve path must return EXACTLY the
    on-the-fly IVF results under the same quantizer — the index is a
    write-amortization, not an approximation on top of an approximation."""
    import pyspark.sql.functions as F

    from fxa_amplitude_send_spark.plans.llm import llm_sim_ivf, llm_sim_ivf_served

    fly = llm_sim_ivf(spark, sf_smoke).select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk"
    )
    served = llm_sim_ivf_served(spark, sf_smoke)
    a = {tuple(r) for r in fly.collect()}
    b = {tuple(r) for r in served.collect()}
    assert a == b and len(a) > 0


def test_hard_negatives_ivf_agreement_floor(spark, sf_correctness):
    """Round-6 verdict item 5: the IVF-backed hard-negative miner must agree
    with the exact broadcast-scan top-5 on >= 0.8 of (anchor, negative)
    pairs — the documented billion-scale swap, made real and gated."""
    from fxa_amplitude_send_spark.plans.llm import (
        llm_hard_negatives,
        llm_hard_negatives_ivf,
    )

    exact = {
        (r.anchor_id, r.vec_id)
        for r in llm_hard_negatives(spark, sf_correctness).collect()
    }
    approx = {
        (r.anchor_id, r.vec_id)
        for r in llm_hard_negatives_ivf(spark, sf_correctness).collect()
    }
    assert len(exact) == 8 * 5, f"exact miner returned {len(exact)} pairs"
    agreement = len(exact & approx) / len(exact)
    assert agreement >= 0.8, f"IVF/exact agreement {agreement:.3f} < 0.8"
