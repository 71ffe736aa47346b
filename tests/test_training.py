"""Semantic properties of the training-data curation operators — invariants
the oracle hash can't express (rate tolerances, packing bounds, PQ geometry)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fxa_amplitude_send_spark.plans import all_queries

QUERIES = all_queries()


def test_source_mix_rates(spark, sf_smoke):
    """Upweighted sources emit 1-2 copies, downweighted 0-1; realized rates
    sit near the target weights."""
    out = QUERIES["llm_source_mix"](spark, sf_smoke)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    per_source = (
        out.groupBy("source").agg(F.count(F.lit(1)).alias("n_out"))
        .join(docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_in")), "source")
        .collect()
    )
    for r in per_source:
        ratio = r.n_out / r.n_in
        if r.source in ("src0", "src1", "src2"):
            assert 1.0 <= ratio <= 2.0
        elif r.source in ("src3", "src4", "src5"):
            assert ratio == 1.0
        else:
            assert 0.0 <= ratio <= 1.0
    copies = out.groupBy("doc_id").agg(F.max("copy_n").alias("m")).agg(
        F.max("m")
    ).collect()[0][0]
    assert copies <= 2


def test_stratified_sample_is_subset_with_target_rates(spark, sf_smoke):
    out = QUERIES["llm_sample_stratified"](spark, sf_smoke)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    # subset of input, no duplicates
    assert out.count() == out.dropDuplicates(["doc_id"]).count()
    assert out.join(docs, "doc_id", "left_anti").count() == 0
    rates = {
        r.lang: r.kept / r.total
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("kept"))
        .join(
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("total")), "lang"
        )
        .collect()
    }
    # hash sampling at n≈100/stratum: generous tolerance, exact rates are
    # verified by the DuckDB oracle anyway
    assert 0.1 < rates["en"] < 0.5
    if "de" in rates:
        assert 0.5 < rates["de"] <= 1.0


def test_bottomk_is_deterministic_uniform_k(spark, sf_smoke):
    a = QUERIES["llm_sample_bottomk"](spark, sf_smoke).collect()
    b = QUERIES["llm_sample_bottomk"](spark, sf_smoke).collect()
    assert len(a) == 100
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_seq_pack_partitions_docs_exactly_once(spark, sf_smoke):
    out = QUERIES["llm_seq_pack"](spark, sf_smoke)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()  # every doc in exactly one pack
    # packs are dense per source starting at 0, and every pack holds >=1 doc
    agg = out.groupBy("source").agg(
        F.min("pack_id").alias("lo"), F.min("n_docs").alias("min_docs")
    )
    assert agg.filter((F.col("lo") != 0) | (F.col("min_docs") < 1)).count() == 0
    # a pack's first token offset is below budget*(pack_id+1) by construction;
    # check token mass: all but the last pack of a source hold >= budget - max
    # doc tokens... simplified invariant: pack_tokens > 0
    assert out.filter(F.col("pack_tokens") <= 0).count() == 0


def test_tfidf_topk_shape(spark, sf_smoke):
    out = QUERIES["llm_tfidf"](spark, sf_smoke)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rnk").alias("max_rnk")
    )
    assert per_doc.filter((F.col("n") > 3) | (F.col("max_rnk") > 3)).count() == 0
    # rare terms outrank stopword-like frequent terms: every score positive
    # (df < N guarantees ln > 0) unless a token appears in every document
    assert out.filter(F.col("score") < 0).count() == 0


def test_pq_codes_geometry(spark, sf_smoke):
    out = QUERIES["llm_pq_codes"](spark, sf_smoke).collect()
    assert len(out) > 0
    for r in out:
        assert len(r.pq_code) == 4
        assert all(0 <= c < 16 for c in r.pq_code)
        assert r.recon_err >= 0.0
    # compression is useful: mean reconstruction error well below the unit
    # vector norm (random coding would sit near sqrt(2) for unit vectors)
    mean_err = sum(r.recon_err for r in out) / len(out)
    assert mean_err < 1.0


def test_connected_components_chain_transitivity(spark):
    """a~b, b~c, c~d (no direct a~d pair) must collapse into one cluster;
    isolated nodes keep their own label."""
    from fxa_amplitude_send_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], ["doc_id"])
    out = {r.doc_id: r.cluster for r in connected_components(edges, nodes=nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_long_chain_converges(spark):
    """A 64-node path graph exercises the pointer-jumping path (log rounds,
    not 64 neighbor rounds)."""
    from fxa_amplitude_send_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["doc_a", "doc_b"]
    )
    out = connected_components(edges, max_iter=10).collect()
    assert len(out) == 64
    assert {r.cluster for r in out} == {0}


def test_connected_components_one_action_per_round(spark, monkeypatch):
    """Each fixpoint round must cost exactly ONE driver action: the
    convergence agg also materializes the round's lazy localCheckpoint.
    A 64-node path converges in ~log2(63) pointer-jumping rounds, so with
    one collect per round (+1 confirming round) the total action count
    must stay well under the old 2-actions-per-round behavior."""
    from fxa_amplitude_send_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["doc_a", "doc_b"]
    )
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract parent whose collect/count the classic backend overrides —
    # patching the parent would intercept nothing and pass vacuously)
    cls = type(edges)
    assert "collect" in cls.__dict__ and "count" in cls.__dict__
    calls = {"collect": 0, "count": 0}
    orig_collect, orig_count = cls.collect, cls.count
    monkeypatch.setattr(
        cls, "collect",
        lambda self: (calls.__setitem__("collect", calls["collect"] + 1),
                      orig_collect(self))[1],
    )
    monkeypatch.setattr(
        cls, "count",
        lambda self: (calls.__setitem__("count", calls["count"] + 1),
                      orig_count(self))[1],
    )
    out = connected_components(edges, max_iter=20)
    rows = orig_collect(out)
    assert calls["collect"] > 0, "instrumentation failed to intercept"
    assert {r.cluster for r in rows} == {0} and len(rows) == 64
    # <= ceil(log2(63)) + slack for the confirming round; no count() actions
    assert calls["collect"] <= 9, calls
    assert calls["count"] == 0, calls


def test_quality_classifier_learns_weak_labels(spark, sf_correctness):
    """The GD-trained logistic regression must actually separate the weak
    labels (balanced ~50/50 at the 0.17 threshold): accuracy >= 0.9, both
    classes present, and training must cost one aggregate action per round
    (25 rounds + stats + scoring, not per-row driver work)."""
    from fxa_amplitude_send_spark.plans import all_queries

    pdf = all_queries()["llm_quality_classifier"](spark, sf_correctness).toPandas()
    assert len(pdf) == 500
    pos = pdf["label"].mean()
    assert 0.2 < pos < 0.8, f"degenerate label balance {pos}"
    acc = pdf["correct"].mean()
    assert acc >= 0.9, f"classifier accuracy {acc}"


def test_logreg_learns_known_boundary(spark):
    """Sanity: on a linearly separable toy set the trained model recovers
    the boundary (accuracy 1.0) — pins the gradient math independent of
    the corpus-derived features."""
    from fxa_amplitude_send_spark.operators.classifier import (
        logreg_accuracy,
        score_logreg,
        train_logreg,
    )

    rows = [(float(i), float(i % 7), 1 if i > 50 else 0) for i in range(101)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, label int")
    w = train_logreg(df, ["x1", "x2"], "label", n_iter=60, lr=2.0)
    acc = logreg_accuracy(score_logreg(df, ["x1", "x2"], w), "label")
    assert acc >= 0.97, (w, acc)


def test_newton_matches_gd_optimum_with_fewer_rounds(spark):
    """IRLS in 6 rounds reaches at least the accuracy of 60-round GD on the
    same separable-ish synthetic data, and the decision boundaries agree."""
    import random

    from fxa_amplitude_send_spark.operators.classifier import (
        logreg_accuracy,
        score_logreg,
        train_logreg,
        train_logreg_newton,
    )

    rng = random.Random(5)
    rows = []
    for i in range(400):
        x1, x2 = rng.gauss(0, 1), rng.gauss(0, 1)
        label = 1 if x1 + 0.5 * x2 + rng.gauss(0, 0.3) > 0 else 0
        rows.append((i, x1, x2, label))
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, label int")

    w_gd = train_logreg(df, ["x1", "x2"], "label", n_iter=60, lr=2.0)
    w_nt = train_logreg_newton(df, ["x1", "x2"], "label", n_iter=6)

    acc_gd = logreg_accuracy(score_logreg(df, ["x1", "x2"], w_gd), "label")
    acc_nt = logreg_accuracy(score_logreg(df, ["x1", "x2"], w_nt), "label")
    # Newton minimizes the LOSS to machine precision; training accuracy is
    # not monotone in loss, so allow a hair of slack vs GD's trajectory.
    assert acc_nt >= acc_gd - 0.01
    assert acc_nt >= 0.9
    # same sign structure and similar direction (Newton converges to the
    # true optimum; GD-60 is close but not identical)
    import math

    n_gd = math.sqrt(sum(v * v for v in w_gd[1:]))
    n_nt = math.sqrt(sum(v * v for v in w_nt[1:]))
    cos = sum(a * b for a, b in zip(w_gd[1:], w_nt[1:])) / (n_gd * n_nt)
    assert cos > 0.99


def test_weighted_sample_is_length_biased_and_deterministic(spark, sf_smoke):
    """Exponential-clock weighted sampling must over-represent heavy docs
    (mean sampled weight > corpus mean) and be bit-stable run-to-run (the
    clocks are hash-derived, not RNG)."""
    from fxa_amplitude_send_spark.plans import all_queries

    fn = all_queries()["llm_sample_weighted"]
    a = fn(spark, sf_smoke).toPandas()
    b = fn(spark, sf_smoke).toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    from fxa_amplitude_send_spark.sources import load_table

    corpus_mean = (
        load_table(spark, sf_smoke, "documents").agg({"n_chars": "avg"})
        .collect()[0][0]
    )
    assert a["n_chars"].mean() > corpus_mean


def test_span_corruption_is_invertible(spark, sf_smoke):
    """The denoising objective must be LOSSLESS: substituting each target
    span back into its input sentinel reconstructs every document exactly
    — token-for-token, including masked runs at document edges and docs
    with zero masked spans."""
    import re

    from fxa_amplitude_send_spark.plans.training import llm_span_corruption
    from fxa_amplitude_send_spark.sources import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_smoke, "documents").collect()
    }
    out = llm_span_corruption(spark, sf_smoke).collect()
    assert len(out) == len(docs)
    for r in out:
        spans = {}
        if r.target_text is not None:
            # target = "<X_0> tok tok <X_1> tok ..." — split on sentinels
            parts = re.split(r"<X_(\d+)> ?", r.target_text)
            # parts = ["", k0, span0, k1, span1, ...]
            for k, span in zip(parts[1::2], parts[2::2]):
                spans[int(k)] = span.rstrip()
        rebuilt = re.sub(
            r"<X_(\d+)>", lambda m: spans[int(m.group(1))], r.input_text
        )
        assert rebuilt == docs[r.doc_id], f"doc {r.doc_id} not reconstructed"
        assert r.n_spans == len(spans)
