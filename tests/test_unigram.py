"""Unigram-LM tokenizer (operators/unigram.py): the distributed trainer
must learn the SAME vocabulary, log-probs, and segmentations as an
independent pure-Python implementation of the published algorithm (Kudo
2018, Viterbi-EM approximation) on the identical corpus — and the encode
path must preserve corpus-level token accounting."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fxa_amplitude_send_spark.operators.unigram import (
    encode_token_counts_unigram,
    seed_pieces,
    train_unigram,
    viterbi_segment,
)
from fxa_amplitude_send_spark.sources import load_table


# ---------- independent pure-Python twin (no Spark, no shared helpers) ----


def _py_word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _py_seed(wc, max_len, n_seed):
    counts = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                p = w[i : i + l]
                counts[p] = counts.get(p, 0) + c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n_seed]
    seen = dict(top)
    for p, c in counts.items():
        if len(p) == 1:
            seen.setdefault(p, c)
    return sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))


def _py_viterbi(word, logp, max_len):
    n = len(word)
    NEG = -1e9
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    for end in range(1, n + 1):
        for plen in range(1, min(max_len, end) + 1):
            start = end - plen
            piece = word[start:end]
            score = logp.get(piece)
            if score is None:
                if plen > 1:
                    continue
                score = NEG
            cand = best[start] + score
            if cand > best[end]:
                best[end] = cand
                back[end] = start
    out = []
    end = n
    while end > 0:
        start = back[end]
        out.append(word[start:end])
        end = start
    return out[::-1]


def _py_logprobs(counts):
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def _py_train(texts, vocab_size, max_len=6, n_seed=400, em_rounds=2, shrink=0.75):
    wc = _py_word_counts(texts)
    counts = dict(_py_seed(wc, max_len, n_seed))
    chars = {p for p in counts if len(p) == 1}

    def em(counts):
        logp = _py_logprobs(counts)
        new = {}
        for w, c in wc.items():
            for p in _py_viterbi(w, logp, max_len):
                new[p] = new.get(p, 0) + c
        return {p: new.get(p, 1 if p in chars else 0) for p in counts}

    def prune_to(counts, keep_multi):
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        kept = dict(multi[:keep_multi])
        kept.update({p: c for p, c in counts.items() if p in chars})
        return kept

    target_multi = max(0, vocab_size - len(chars))
    while True:
        for _ in range(em_rounds):
            counts = em(counts)
        n_multi = sum(1 for p in counts if len(p) > 1 and counts[p] > 0)
        if n_multi <= target_multi:
            counts = prune_to(counts, target_multi)
            break
        counts = prune_to(counts, max(target_multi, int(n_multi * shrink)))

    logp = _py_logprobs(counts)
    new = {}
    for w, c in wc.items():
        for p in _py_viterbi(w, logp, max_len):
            new[p] = new.get(p, 0) + c
    counts = {p: new.get(p, 1 if p in chars else 0) for p in counts}
    counts = {p: c for p, c in counts.items() if c > 0 or p in chars}
    logp = _py_logprobs({p: max(c, 1) for p, c in counts.items()})
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def _py_fb_counts(word, logp, max_len, grid):
    n = len(word)
    NEG = -1e9

    def lse(xs):
        m = max(xs)
        if m == float("-inf"):
            return m
        return m + math.log(sum(math.exp(x - m) for x in xs))

    def score(piece):
        s = logp.get(piece)
        if s is None:
            return NEG if len(piece) == 1 else None
        return s

    alpha = [0.0] + [float("-inf")] * n
    for end in range(1, n + 1):
        cands = []
        for plen in range(1, min(max_len, end) + 1):
            s = score(word[end - plen : end])
            if s is not None:
                cands.append(alpha[end - plen] + s)
        if cands:
            alpha[end] = lse(cands)
    beta = [float("-inf")] * n + [0.0]
    for start in range(n - 1, -1, -1):
        cands = []
        for plen in range(1, min(max_len, n - start) + 1):
            s = score(word[start : start + plen])
            if s is not None:
                cands.append(s + beta[start + plen])
        if cands:
            beta[start] = lse(cands)
    z = alpha[n]
    post = {}
    for start in range(n):
        for plen in range(1, min(max_len, n - start) + 1):
            piece = word[start : start + plen]
            s = logp.get(piece)
            if s is None:
                continue
            post[piece] = post.get(piece, 0.0) + math.exp(
                alpha[start] + s + beta[start + plen] - z
            )
    out = {p: int(round(v * grid)) for p, v in post.items()}
    return {p: c for p, c in out.items() if c > 0}


def _py_prune_by_loss(counts, chars, keep_multi, max_len):
    floored = {p: max(c, 1) for p, c in counts.items()}
    logp = _py_logprobs(floored)
    vsum = float(sum(floored.values()))
    scored = []
    for p, c in counts.items():
        if len(p) == 1:
            continue
        if c <= 0:
            scored.append((float("-inf"), p))
            continue
        alt_logp = dict(logp)
        alt_logp.pop(p, None)
        alt = _py_viterbi(p, alt_logp, max_len)
        fx = float(c)
        logprob_sp = math.log(fx) - math.log(vsum)
        logsum_alt = math.log(vsum + fx * (len(alt) - 1))
        logprob_alt = sum(
            math.log(float(floored.get(a, 1)) + fx) - logsum_alt for a in alt
        )
        scored.append((fx * (logprob_sp - logprob_alt), p))
    scored.sort(key=lambda lp: (-lp[0], lp[1]))
    kept = {p for _, p in scored[:keep_multi]}
    out = {p: c for p, c in counts.items() if p in kept}
    out.update({p: c for p, c in counts.items() if p in chars})
    return out


def _py_train_full(
    texts, vocab_size, max_len=6, n_seed=400, em_rounds=2, shrink=0.75,
    grid=1_000_000,
):
    wc = _py_word_counts(texts)
    counts = {p: c * grid for p, c in _py_seed(wc, max_len, n_seed)}
    chars = {p for p in counts if len(p) == 1}

    def em(counts):
        logp = _py_logprobs(counts)
        new = {}
        for w, c in wc.items():
            for p, ec in _py_fb_counts(w, logp, max_len, grid).items():
                new[p] = new.get(p, 0) + ec * c
        return {p: new.get(p, 1 if p in chars else 0) for p in counts}

    target_multi = max(0, vocab_size - len(chars))
    while True:
        for _ in range(em_rounds):
            counts = em(counts)
        n_multi = sum(1 for p in counts if len(p) > 1 and counts[p] > 0)
        if n_multi <= target_multi:
            counts = _py_prune_by_loss(counts, chars, target_multi, max_len)
            break
        counts = _py_prune_by_loss(
            counts, chars, max(target_multi, int(n_multi * shrink)), max_len
        )

    counts = em(counts)
    counts = {p: c for p, c in counts.items() if c > 0 or p in chars}
    logp = _py_logprobs({p: max(c, 1) for p, c in counts.items()})
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


# ------------------------------- tests -----------------------------------


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents")


def test_seed_pieces_match_pure_python(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    from fxa_amplitude_send_spark.operators.bpe import word_counts

    got = seed_pieces(word_counts(docs), max_piece_len=4, n_seed=100)
    want = _py_seed(_py_word_counts(texts), 4, 100)
    assert got == want


def test_train_unigram_matches_pure_python_twin(spark, docs):
    """Piece-for-piece, logp-for-logp equality with the independent
    implementation — every tie-break in seed/EM/prune is total, so the two
    must agree EXACTLY (floats included: identical count ratios)."""
    texts = [r["text"] for r in docs.select("text").collect()]
    got = train_unigram(docs, vocab_size=80, max_piece_len=4, n_seed=150)
    want = _py_train(texts, vocab_size=80, max_len=4, n_seed=150)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (_, wl) in zip(got, want):
        assert gl == pytest.approx(wl, abs=1e-12), gp


def test_viterbi_prefers_learned_multi_char_pieces(spark, docs):
    pieces = dict(train_unigram(docs, vocab_size=80, max_piece_len=4, n_seed=150))
    multi = [p for p in pieces if len(p) > 1]
    assert multi, "training must learn at least one multi-char piece"
    # segmenting a learned piece by itself must return it whole
    p = max(multi, key=lambda x: (pieces[x], x))
    assert viterbi_segment(p, pieces, 4) == [p]
    # and any word is segmentable, even with unknown characters
    assert viterbi_segment("zzqq7", pieces, 4)


def test_encode_counts_match_driver_side_segmentation(spark, docs):
    """The distributed encode (per-distinct-word Viterbi + broadcast join)
    must agree with segmenting every token on the driver."""
    pieces = train_unigram(docs, vocab_size=80, max_piece_len=4, n_seed=150)
    logp = dict(pieces)
    out = {
        r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_unigram"])
        for r in encode_token_counts_unigram(docs, pieces, max_piece_len=4).collect()
    }
    sample = docs.select("doc_id", "text").orderBy("doc_id").limit(25).collect()
    for r in sample:
        words = [w for w in r["text"].split(" ") if w]
        want_ws = len(words)
        want_uni = sum(len(viterbi_segment(w, logp, 4)) for w in words)
        assert out[r["doc_id"]] == (want_ws, want_uni)


def test_full_em_matches_pure_python_twin(spark, docs):
    """Exact-EM mode (forward-backward expected counts on the integer grid
    + likelihood-loss pruning) must agree piece-for-piece and
    logp-for-logp with the independent twin — the grid quantization makes
    the distributed soft-count sums exactly reproducible."""
    texts = [r["text"] for r in docs.select("text").collect()]
    got = train_unigram(
        docs, vocab_size=80, max_piece_len=4, n_seed=150,
        em_mode="full", prune_mode="loss",
    )
    want = _py_train_full(texts, vocab_size=80, max_len=4, n_seed=150)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (_, wl) in zip(got, want):
        assert gl == pytest.approx(wl, abs=1e-12), gp


def test_fb_counts_are_posterior_marginals(spark):
    """On a hand-checkable lattice the expected counts must equal the
    analytic posterior: 'abab' under {ab, a, b} has two segmentations per
    half... verify against explicit enumeration of all segmentations."""
    from fxa_amplitude_send_spark.operators.unigram import (
        forward_backward_counts,
    )

    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    grid = 10**9

    # enumerate all segmentations of 'abab' with pieces from the vocab
    def segs(w):
        if not w:
            return [[]]
        out = []
        for p in logp:
            if w.startswith(p):
                out += [[p] + rest for rest in segs(w[len(p):])]
        return out

    word = "abab"
    total = 0.0
    expect = {}
    for s in segs(word):
        pr = math.exp(sum(logp[p] for p in s))
        total += pr
        for p in s:
            expect[p] = expect.get(p, 0.0) + pr
    want = {p: int(round(v / total * grid)) for p, v in expect.items()}
    got = forward_backward_counts(word, logp, max_len=2, grid=grid)
    assert got == want


def test_loss_prune_keeps_load_bearing_pieces(spark, docs):
    """A piece whose removal costs likelihood (high frequency, poor
    alternative) must outrank a zero-frequency piece; chars always
    survive."""
    from fxa_amplitude_send_spark.operators.unigram import prune_by_loss

    counts = {"a": 50, "b": 30, "ab": 100, "ba": 0, "aab": 40}
    out = prune_by_loss(counts, {"a", "b"}, keep_multi=2, max_len=3)
    assert "ab" in out and "aab" in out and "ba" not in out
    assert "a" in out and "b" in out


def test_train_unigram_rejects_unknown_modes(spark, docs):
    with pytest.raises(ValueError, match="em_mode"):
        train_unigram(docs, em_mode="soft")
    with pytest.raises(ValueError, match="prune_mode"):
        train_unigram(docs, prune_mode="likelihood")


def test_registered_unigram_queries_return_rows(spark, sf_smoke):
    from fxa_amplitude_send_spark.plans import all_queries

    q = all_queries()
    vocab = q["llm_unigram_train"](spark, sf_smoke)
    enc = q["llm_unigram_encode"](spark, sf_smoke)
    pieces = vocab.collect()
    assert len(pieces) > 0
    assert all(p["logp"] <= 0 for p in pieces)
    full = q["llm_unigram_train_full"](spark, sf_smoke).collect()
    assert len(full) > 0
    assert all(p["logp"] <= 0 for p in full)
    # soft counts keep more pieces alive than hard Viterbi counts
    assert len(full) >= len(pieces)
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert enc.count() == n_docs
    bad = enc.filter(F.col("n_tokens_unigram") < F.col("n_tokens_ws")).count()
    assert bad == 0, "a word segments into >= 1 piece"


def test_fixed_pieces_fit_encoder_window_and_uniform_logp():
    """llm_unigram_encode_fixed's oracle contract has two preconditions:
    every frozen piece must fit the encoder's default max_piece_len (a
    longer piece would silently never match, diverging from the DuckDB
    BFS which has no length window), and every logp must be EXACTLY -1.0
    (uniform integer-valued scores are what make Viterbi's argmax equal
    minimum-piece-count with exact float sums — the property the oracle
    verifies). Pin both so a future vocab edit cannot break the gate
    semantics without failing here."""
    import inspect

    from fxa_amplitude_send_spark.operators.unigram import (
        encode_token_counts_unigram,
    )
    from fxa_amplitude_send_spark.plans.corpus import FIXED_PIECES

    default_window = inspect.signature(
        encode_token_counts_unigram
    ).parameters["max_piece_len"].default
    assert all(len(p) <= default_window for p, _ in FIXED_PIECES)
    assert all(lp == -1.0 for _, lp in FIXED_PIECES)
    # single-char fallback must cover ASCII letters+digits so no word hits
    # the UNK path (which the oracle does not model)
    singles = {p for p, _ in FIXED_PIECES if len(p) == 1}
    import string

    assert set(string.ascii_lowercase) <= singles
    assert set(string.digits) <= singles
