"""Unit tests for the composite operators: as-of join, MinHash/SimHash
dedup, ANN, multimodal plumbing — toy inputs with hand-checked expectations."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest


def ts(s):
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def make(self, spark):
        left = spark.createDataFrame(
            [
                (1, ts("2024-01-01T10:00:00"), "p1"),
                (1, ts("2024-01-01T12:00:00"), "p2"),
                (2, ts("2024-01-01T09:00:00"), "p3"),
            ],
            "user_id int, ts timestamp, name string",
        )
        right = spark.createDataFrame(
            [
                (1, ts("2024-01-01T09:30:00"), 10.0),
                (1, ts("2024-01-01T11:00:00"), 20.0),
                (2, ts("2024-01-01T09:30:00"), 30.0),  # after p3 → no match
            ],
            "user_id int, ts timestamp, price double",
        )
        return left, right

    def test_backward_semantics(self, spark):
        from fxa_amplitude_send_spark.operators.joins import asof_join

        left, right = self.make(spark)
        out = {
            r["name"]: (r["asof_ts"], r["asof_price"])
            for r in asof_join(
                left, right, on="user_id", right_value_cols=("price",)
            ).collect()
        }
        assert out["p1"] == (ts("2024-01-01T09:30:00"), 10.0)
        assert out["p2"] == (ts("2024-01-01T11:00:00"), 20.0)
        assert out["p3"] == (None, None)  # no right row at-or-before

    def test_same_instant_included(self, spark):
        from fxa_amplitude_send_spark.operators.joins import asof_join

        left = spark.createDataFrame(
            [(1, ts("2024-01-01T10:00:00"), "p")], "user_id int, ts timestamp, name string"
        )
        right = spark.createDataFrame(
            [(1, ts("2024-01-01T10:00:00"), 5.0)], "user_id int, ts timestamp, price double"
        )
        rows = asof_join(left, right, on="user_id", right_value_cols=("price",)).collect()
        assert rows[0]["asof_price"] == 5.0  # at-or-before includes equal ts


class TestMinHash:
    def test_identical_docs_full_estimate(self, spark):
        from fxa_amplitude_send_spark.operators.dedup import minhash_lsh_pairs

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "x y z w q r s t")],
            "doc_id long, text string",
        )
        rows = minhash_lsh_pairs(docs, threshold=0.5).collect()
        assert len(rows) == 1
        assert rows[0]["doc_a"] == 1 and rows[0]["doc_b"] == 2
        assert rows[0]["est_jaccard"] == 1.0

    def test_estimate_tracks_exact_jaccard(self, spark):
        from fxa_amplitude_send_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        # 9 shared tokens of 10 → exact jaccard ~0.818; k=64 estimate within ~0.2
        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i k")],
            "doc_id long, text string",
        )
        exact = ngram_jaccard_pairs(docs, threshold=0.0).collect()[0]["jaccard"]
        est = minhash_lsh_pairs(docs, threshold=0.0).collect()[0]["est_jaccard"]
        assert exact == pytest.approx(9 / 11, abs=1e-6)
        assert abs(est - exact) < 0.2

    def test_signature_deterministic(self, spark):
        from fxa_amplitude_send_spark.operators.dedup import minhash_signature, shingles_col

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        sig = docs.select(minhash_signature(shingles_col(F.col("text"))).alias("s"))
        a = sig.collect()[0]["s"]
        b = sig.collect()[0]["s"]
        assert a == b and len(a) == 64


class TestSimHash:
    def test_identical_zero_hamming(self, spark):
        from fxa_amplitude_send_spark.operators.dedup import simhash_near_pairs

        docs = spark.createDataFrame(
            [(1, "spark query engine fast"), (2, "spark query engine fast"),
             (3, "completely different words entirely here now")],
            "doc_id long, text string",
        )
        rows = simhash_near_pairs(docs, max_hamming=0).collect()
        assert len(rows) == 1
        assert (rows[0]["doc_a"], rows[0]["doc_b"], rows[0]["hamming"]) == (1, 2, 0)


class TestAnn:
    def test_ann_finds_exact_duplicate_vector(self, spark):
        from fxa_amplitude_send_spark.operators.similarity import ann_bucketed_topk

        vecs = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.01, 0.0, 0.0]),  # near-dup of 1
            (3, [-1.0, 0.0, 0.0, 0.0]),
        ]
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        queries = emb.filter(F.col("vec_id") == 1).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        rows = ann_bucketed_topk(emb, queries, k=2, n_planes=4, vec_col="embedding").collect()
        ids = [r["vec_id"] for r in rows]
        assert 2 in ids  # the near-dup shares every hyperplane sign bucket


class TestMultimodal:
    def test_decode_meta_matches_bytes(self, spark):
        from fxa_amplitude_send_spark.operators.multimodal import (
            attach_binary_payload,
            decode_image_meta,
            frame_sample,
        )

        docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
        meta = decode_image_meta(attach_binary_payload(docs)).collect()[0]
        n = len("hello world".encode())
        assert meta["n_bytes"] == n
        assert meta["width"] == 64 + n % 512
        assert meta["height"] == 64 + (n * 7) % 512
        assert meta["n_frames"] == 1 + ord("h") % 8
        assert meta["decode_stub"] is True
        frames = frame_sample(
            decode_image_meta(attach_binary_payload(docs)), every_nth=2
        ).collect()
        assert [f["frame_idx"] for f in frames] == list(range(0, meta["n_frames"], 2))

    def test_resize_preserves_aspect(self, spark):
        from fxa_amplitude_send_spark.operators.multimodal import (
            attach_binary_payload,
            decode_image_meta,
            resize_meta,
        )

        docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
        out = resize_meta(
            decode_image_meta(attach_binary_payload(docs)), target=224
        ).collect()[0]
        short = min(out["width"], out["height"])
        assert min(out["out_width"], out["out_height"]) in (223, 224, 225)
        assert abs(out["scale"] - 224 / short) < 1e-5
        # aspect ratio preserved to rounding
        assert abs(
            out["out_width"] / out["out_height"] - out["width"] / out["height"]
        ) < 0.02

    def test_real_wav_decode_via_stdlib(self, spark):
        """A genuine RIFF/WAVE payload must decode REAL (stdlib wave):
        actual sample rate and frame count, decode_stub False — while a
        non-WAV payload in the same batch takes the deterministic stub."""
        import io
        import wave

        from fxa_amplitude_send_spark.operators.multimodal import (
            decode_audio_meta,
        )

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(22050)
            w.writeframes(b"\x00\x01" * 4410)  # 4410 frames = 0.2 s
        wav_bytes = buf.getvalue()

        df = spark.createDataFrame(
            [(1, bytearray(wav_bytes)), (2, bytearray(b"not audio"))],
            "doc_id long, payload binary",
        )
        meta = {r["doc_id"]: r for r in decode_audio_meta(df).collect()}
        assert meta[1]["decode_stub"] is False
        assert meta[1]["sample_rate"] == 22050
        assert meta[1]["n_samples"] == 4410
        assert meta[2]["decode_stub"] is True
        assert meta[2]["sample_rate"] in (8000, 16000)  # fake path intact
        assert meta[2]["n_samples"] == len(b"not audio") * 16

    def test_real_image_header_decode(self, spark):
        """PNG / GIF / JPEG headers must decode REAL dimensions via the
        stdlib parser; garbage falls back to the stub."""
        import struct
        import zlib

        from fxa_amplitude_send_spark.operators.multimodal import (
            decode_image_meta,
        )

        def png(w, h):
            ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
            chunk = b"IHDR" + ihdr
            return (
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", len(ihdr))
                + chunk
                + struct.pack(">I", zlib.crc32(chunk))
            )

        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 5
        # minimal JPEG: SOI, APP0 stub, SOF0 with dims, EOI
        jpeg = (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
            + b"\xff\xc0" + struct.pack(">H", 11)
            + b"\x08" + struct.pack(">HH", 480, 640) + b"\x03\x00\x00\x00"
            + b"\xff\xd9"
        )
        df = spark.createDataFrame(
            [
                (1, bytearray(png(123, 77))),
                (2, bytearray(gif)),
                (3, bytearray(jpeg)),
                (4, bytearray(b"plain text payload")),
            ],
            "doc_id long, payload binary",
        )
        meta = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
        assert (meta[1]["width"], meta[1]["height"], meta[1]["decode_stub"]) == (123, 77, False)
        assert (meta[2]["width"], meta[2]["height"], meta[2]["decode_stub"]) == (320, 200, False)
        assert (meta[3]["width"], meta[3]["height"], meta[3]["decode_stub"]) == (640, 480, False)
        assert meta[4]["decode_stub"] is True
        n = len(b"plain text payload")
        assert meta[4]["width"] == 64 + n % 512  # fake path intact

    def test_extract_features_deterministic_unit_free(self, spark):
        from fxa_amplitude_send_spark.operators.multimodal import (
            attach_binary_payload,
            extract_features,
        )

        docs = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "other")],
            "doc_id long, text string",
        )
        feats = {
            r["doc_id"]: r["features"]
            for r in extract_features(attach_binary_payload(docs), dim=16).collect()
        }
        assert len(feats[1]) == 16
        assert feats[1] == feats[2]  # deterministic: same payload, same vector
        assert feats[1] != feats[3]
        assert all(-1.0 <= v <= 1.0 for v in feats[1])


class TestIVF:
    def test_ivf_finds_planted_neighbor(self, spark):
        from pyspark.sql import functions as F

        from fxa_amplitude_send_spark.operators.similarity import (
            ivf_topk,
            train_ivf_centroids,
        )

        # two well-separated clusters + a planted near-dup of vector 1
        base = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        vecs = []
        for i in range(40):
            c = base[i % 2]
            vecs.append((i, [v + 0.01 * ((i * 7) % 5) for v in c]))
        vecs.append((100, [1.0, 0.001, 0.0, 0.0]))  # near-dup of cluster 0
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        cents = train_ivf_centroids(emb, n_centroids=2, n_iter=4, sample_n=64)
        assert len(cents) == 2
        queries = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        rows = ivf_topk(emb, queries, cents, k=10, n_probe=1).collect()
        ids = [r["vec_id"] for r in rows]
        assert 100 in ids  # planted near-dup lands in the same learned cell
        # no cluster-1 vector may appear: one probe = one learned cell
        assert not any(i % 2 == 1 for i in ids if i < 100)
        assert all(r["query_id"] == 0 for r in rows)

    def test_ivf_assignment_is_cellwise_join(self, spark):
        """Candidate generation must be an equi-join on cell id, never a
        cartesian product."""
        import io
        from contextlib import redirect_stdout

        from pyspark.sql import functions as F

        from fxa_amplitude_send_spark.operators.similarity import (
            ivf_topk,
            train_ivf_centroids,
        )

        emb = spark.createDataFrame(
            [(i, [float(i % 3), 1.0, 0.0, 0.0]) for i in range(12)],
            "vec_id long, embedding array<float>",
        )
        cents = train_ivf_centroids(emb, n_centroids=2, n_iter=2, sample_n=12)
        q = emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        df = ivf_topk(emb, q, cents, k=2, n_probe=1)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        assert "CartesianProduct" not in buf.getvalue()


class TestBloomSemiJoinReduction:
    def test_no_false_negatives_and_real_reduction(self, spark, sf_correctness):
        """Every true-matching fact row must pass the probe (bloom contract);
        the probe must also actually shrink the fact side, or it's a no-op."""
        from pyspark.sql import functions as F

        from fxa_amplitude_send_spark.operators.bloom import bloom_build, bloom_probe
        from fxa_amplitude_send_spark.sources import load_table

        orders = load_table(spark, sf_correctness, "orders")
        dim = load_table(spark, sf_correctness, "customer").filter(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000)
        )
        bloom = bloom_build(dim.select("c_custkey"), "c_custkey")
        probed = bloom_probe(orders, "o_custkey", bloom)

        true_match = orders.join(
            dim, orders.o_custkey == dim.c_custkey, "left_semi"
        )
        # no false negatives: true matches ⊆ probed
        assert true_match.join(
            probed.select("o_orderkey"), "o_orderkey", "left_anti"
        ).count() == 0
        # real reduction: false-positive rate keeps the probe useful
        n_fact, n_probed = orders.count(), probed.count()
        assert n_probed < n_fact * 0.5, (n_probed, n_fact)

    def test_tiny_bitmap_fp_rate(self, spark):
        """Under-sized bitmap (256 bits, 500 keys): probe still has zero
        false negatives; false positives appear but the real join removes
        them — the correctness story the registered query relies on."""
        from pyspark.sql import functions as F

        from fxa_amplitude_send_spark.operators.bloom import bloom_build, bloom_probe

        keys = spark.range(500).select(F.col("id").alias("k"))
        fact = spark.range(5000).select(F.col("id").alias("k"))
        bloom = bloom_build(keys, "k", n_bits=256)
        probed = bloom_probe(fact, "k", bloom, n_bits=256)
        assert probed.filter(F.col("k") < 500).count() == 500


class TestIVFIncremental:
    def test_append_serves_identically_to_full_rebuild(self, spark, sf_correctness):
        """Build the IVF index on the first half of the corpus, append the
        second half incrementally (only the new vectors are assigned), and
        assert the served top-k equals a full-rebuild index's top-k under
        the same quantizer — ingest without reindex."""
        from pyspark.sql import functions as F

        from fxa_amplitude_send_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            ivf_topk_served,
            train_ivf_centroids,
        )
        from fxa_amplitude_send_spark.sources import load_table

        emb = load_table(spark, sf_correctness, "embeddings")
        centroids = train_ivf_centroids(emb, n_centroids=16, n_iter=5, sample_n=512)
        half_a = emb.filter(F.col("vec_id") % 2 == 0)
        half_b = emb.filter(F.col("vec_id") % 2 == 1)
        queries = emb.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )

        import uuid

        sig_inc = f"inc-{uuid.uuid4().hex[:8]}"
        base = build_ivf_index(spark, half_a, centroids, sig=sig_inc)
        n_base = base.count()
        grown = append_to_ivf_index(spark, half_b, centroids, sig=sig_inc)
        assert grown.count() == emb.count() and n_base < grown.count()

        sig_full = f"full-{uuid.uuid4().hex[:8]}"
        full = build_ivf_index(spark, emb, centroids, sig=sig_full)

        def topk(index):
            return {
                (r["query_id"], r["rnk"]): r["vec_id"]
                for r in ivf_topk_served(
                    index, queries, centroids, k=5, n_probe=10
                ).collect()
            }

        assert topk(grown) == topk(full)

    def test_appended_index_joins_without_exchange(self, spark, sf_correctness):
        """The appended index table keeps its bucketing spec: a self-join
        on the bucket key plans bucket-aligned scans (no join-side
        Exchange) just like the base table."""
        import io
        import re
        import uuid
        from contextlib import redirect_stdout

        from pyspark.sql import functions as F

        from fxa_amplitude_send_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            train_ivf_centroids,
        )
        from fxa_amplitude_send_spark.sources import load_table

        emb = load_table(spark, sf_correctness, "embeddings")
        centroids = train_ivf_centroids(emb, n_centroids=16, n_iter=5, sample_n=512)
        sig = f"plan-{uuid.uuid4().hex[:8]}"
        build_ivf_index(
            spark, emb.filter(F.col("vec_id") % 2 == 0), centroids, sig=sig
        )
        grown = append_to_ivf_index(
            spark, emb.filter(F.col("vec_id") % 2 == 1), centroids, sig=sig
        )

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = grown.alias("a").join(
                grown.alias("b"), "cell"
            ).groupBy("cell").count()
            buf = io.StringIO()
            with redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
            assert n_ex <= 1, plan  # only the final groupBy may exchange
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_tombstone_deletes_serve_like_a_rebuild(self, spark, sf_correctness):
        """Deleting vectors via tombstones must serve the same top-k as an
        index physically rebuilt without them — merge-on-read deletion."""
        import uuid

        from pyspark.sql import functions as F

        from fxa_amplitude_send_spark.operators.similarity import (
            build_ivf_index,
            ivf_topk_served,
            train_ivf_centroids,
        )
        from fxa_amplitude_send_spark.sources import load_table

        emb = load_table(spark, sf_correctness, "embeddings")
        centroids = train_ivf_centroids(emb, n_centroids=16, n_iter=5, sample_n=512)
        queries = emb.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        full = build_ivf_index(
            spark, emb, centroids, sig=f"del-{uuid.uuid4().hex[:8]}"
        )
        # delete the trivial self-matches: every query's own vector
        tombs = queries.select(F.col("query_id").alias("vec_id"))
        with_tombs = {
            (r["query_id"], r["rnk"]): r["vec_id"]
            for r in ivf_topk_served(
                full, queries, centroids, k=5, n_probe=10, tombstones=tombs
            ).collect()
        }
        # ground truth: physically rebuild without the deleted rows
        kept = emb.join(tombs, emb["vec_id"] == tombs["vec_id"], "left_anti")
        rebuilt = build_ivf_index(
            spark, kept, centroids, sig=f"del2-{uuid.uuid4().hex[:8]}"
        )
        rebuilt_topk = {
            (r["query_id"], r["rnk"]): r["vec_id"]
            for r in ivf_topk_served(
                rebuilt, queries, centroids, k=5, n_probe=10
            ).collect()
        }
        assert with_tombs == rebuilt_topk
        assert all(qid != vid for (qid, _), vid in with_tombs.items())


class TestPCA:
    def test_pca_variance_and_orthogonality(self, spark, sf_correctness):
        """Components must be orthonormal, the explained-variance ratios
        descending, and the k=16 projection must capture more variance
        than 16/64 of the total (PCA beats a random axis subset)."""
        import numpy as np

        from fxa_amplitude_send_spark.operators.decomposition import train_pca
        from fxa_amplitude_send_spark.sources import load_table

        emb = load_table(spark, sf_correctness, "embeddings")
        mean, comps, ratio = train_pca(emb, n_components=16)
        C = np.asarray(comps)
        assert C.shape == (16, 64)
        assert np.allclose(C @ C.T, np.eye(16), atol=1e-8)
        assert all(ratio[i] >= ratio[i + 1] - 1e-12 for i in range(15))
        assert sum(ratio) > 16 / 64

    def test_pca_projection_reconstruction(self, spark, sf_correctness):
        """Projecting then back-projecting must reproduce each vector up to
        the discarded-variance residual: mean squared reconstruction error
        ≈ (1 − Σratio)·total_variance, and exactly 0 at full rank."""
        import numpy as np

        from fxa_amplitude_send_spark.operators.decomposition import (
            project_pca,
            train_pca,
        )
        from fxa_amplitude_send_spark.sources import load_table

        emb = load_table(spark, sf_correctness, "embeddings").limit(200)
        mean, comps, ratio = train_pca(emb, n_components=64)
        # full rank: projection preserves squared norm about the mean
        proj = project_pca(emb, mean, comps).collect()
        orig = {r["vec_id"]: np.asarray(r["embedding"], float)
                for r in emb.select("vec_id", "embedding").collect()}
        M, C = np.asarray(mean), np.asarray(comps)
        for r in proj[:50]:
            x = orig[r["vec_id"]]
            back = M + np.asarray(r["pca"]) @ C
            assert np.allclose(back, x, atol=1e-6)


class TestAsofNearest:
    """direction='nearest': minimum |right.ts - left.ts| per key, ties at-or-
    before win; both directional fills share one shuffle."""

    def test_picks_closer_side_and_breaks_ties_backward(self, spark):
        from fxa_amplitude_send_spark.operators.joins import asof_join

        left = spark.createDataFrame(
            [
                (1, ts("2024-01-01T10:00:00"), "near_fwd"),    # fwd 30min vs back 2h
                (1, ts("2024-01-01T13:00:00"), "near_back"),   # back 30min vs fwd 3h
                (1, ts("2024-01-01T11:30:00"), "exact_tie"),   # 60min both -> back
                (2, ts("2024-01-01T10:00:00"), "no_right"),
            ],
            "user_id int, ts timestamp, name string",
        )
        right = spark.createDataFrame(
            [
                (1, ts("2024-01-01T08:00:00"), 1.0),
                (1, ts("2024-01-01T10:30:00"), 2.0),
                (1, ts("2024-01-01T12:30:00"), 3.0),
                (1, ts("2024-01-01T16:00:00"), 4.0),
            ],
            "user_id int, ts timestamp, price double",
        )
        out = {
            r["name"]: (r["asof_ts"], r["asof_price"])
            for r in asof_join(
                left, right, on="user_id", right_value_cols=("price",),
                direction="nearest",
            ).collect()
        }
        assert out["near_fwd"] == (ts("2024-01-01T10:30:00"), 2.0)
        assert out["near_back"] == (ts("2024-01-01T12:30:00"), 3.0)
        assert out["exact_tie"] == (ts("2024-01-01T10:30:00"), 2.0)  # backward
        assert out["no_right"] == (None, None)

    def test_equal_instant_wins_at_distance_zero(self, spark):
        from fxa_amplitude_send_spark.operators.joins import asof_join

        left = spark.createDataFrame(
            [(1, ts("2024-01-01T10:00:00"), "p")],
            "user_id int, ts timestamp, name string",
        )
        right = spark.createDataFrame(
            [
                (1, ts("2024-01-01T10:00:00"), 5.0),
                (1, ts("2024-01-01T10:00:01"), 6.0),
            ],
            "user_id int, ts timestamp, price double",
        )
        rows = asof_join(
            left, right, on="user_id", right_value_cols=("price",),
            direction="nearest",
        ).collect()
        assert rows[0]["asof_price"] == 5.0
