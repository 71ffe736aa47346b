"""Sketch twins vs their exact queries: the documented 100 TB paths,
error-bound-checked.

Each `*_hll` / `*_approx` / `*_sketch` query re-expresses an exact
aggregate with a mergeable constant-memory sketch (Datasketches HLL,
HLL++, Greenwald-Khanna). These tests pin the approximation error against
the exact twin at sf0.01 so the scale story is checked code, not prose.
"""

from __future__ import annotations

from fxa_amplitude_send_spark.plans import all_queries

QUERIES = all_queries()


def test_rolling_distinct_hll_error_bound(spark, sf_correctness):
    exact = {
        r.day: r.wau
        for r in QUERIES["q_rolling_distinct"](spark, sf_correctness).collect()
    }
    approx = {
        r.day: r.wau_approx
        for r in QUERIES["q_rolling_distinct_hll"](spark, sf_correctness).collect()
    }
    assert set(approx) == set(exact)
    # lgConfigK=12 Datasketches HLL: ~1.6% RSE published; allow 2%
    for day, wau in exact.items():
        assert abs(approx[day] - wau) <= max(2, 0.02 * wau), (
            day, wau, approx[day],
        )


def test_funnel_latency_approx_error_bound(spark, sf_correctness):
    exact = QUERIES["q_funnel_latency"](spark, sf_correctness).collect()[0]
    approx = QUERIES["q_funnel_latency_approx"](spark, sf_correctness).collect()[0]
    # the non-sketched aggregates must be identical
    assert approx.n_converted == exact.n_converted
    assert approx.mean_s == exact.mean_s
    for col in ("p50_s", "p90_s"):
        e, a = getattr(exact, col), getattr(approx, col)
        assert abs(a - e) <= 0.05 * max(e, 1.0), (col, e, a)


def test_dataset_card_sketch_error_bound(spark, sf_correctness):
    exact = QUERIES["llm_dataset_card"](spark, sf_correctness).collect()[0]
    approx = QUERIES["llm_dataset_card_sketch"](spark, sf_correctness).collect()[0]
    # exact aggregates unchanged
    assert approx.n_docs == exact.n_docs
    assert approx.n_tokens == exact.n_tokens
    assert approx.avg_chars == exact.avg_chars
    # HLL++ at rsd=1% is exact at single-digit cardinalities
    assert approx.n_langs == exact.n_langs
    assert approx.n_sources == exact.n_sources
    for col in ("p50_chars", "p95_chars"):
        e, a = getattr(exact, col), getattr(approx, col)
        assert abs(a - e) <= 0.05 * max(e, 1.0), (col, e, a)
