"""Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
Regularization" — the SentencePiece unigram model; public algorithm) as
iterative Spark jobs.

Same scale split as the BPE trainer (operators/bpe.py): the ONLY
corpus-sized job is the word-frequency aggregate (shuffle proportional to
vocabulary — map-side combine does the heavy lifting). Everything after
runs on the VOCABULARY:

  1. Seed: all substrings (length <= max_piece_len) of the distinct words,
     weighted by word count — a vocabulary-sized explode + aggregate, all
     codegen'd expressions; keep the n_seed most frequent plus every single
     character (so any word stays segmentable).
  2. EM rounds: the E-step segments each DISTINCT word under the current
     piece log-probs and emits count-weighted piece frequencies. Two modes:
     ``em_mode="viterbi"`` (default) emits hard counts from the single best
     segmentation; ``em_mode="full"`` runs Kudo's exact E-step — a
     forward-backward pass over the word's segmentation lattice whose
     per-occurrence posterior marginals become EXPECTED counts. Both are
     per-word DPs that built-in expressions cannot state, so each runs as
     ONE Arrow-batched pandas UDF over the vocabulary — closure-local code
     only (executors do not have the repo on sys.path). The M-step
     renormalizes counts into log-probs on the driver: the piece table is
     O(n_seed) rows, the same bounded-driver-state contract as the BPE
     argmax and the IVF k-means.
  3. Prune: ``prune_mode="count"`` (default) drops the lowest-count
     multi-character pieces; ``prune_mode="loss"`` ranks pieces by the
     SentencePiece likelihood-loss criterion — how much the corpus
     log-likelihood drops if the piece is removed and its occurrences
     re-segment through their best alternative — and drops the least
     harmful. Single chars are never dropped (segmentability invariant);
     ``shrink`` per round until ``vocab_size`` remains, then a final EM
     pass.

Determinism: seed selection orders by (count DESC, piece ASC); Viterbi
improvement is strict (ties keep the FIRST candidate in ascending
piece-length order); prune orders by (count ASC, piece DESC) or
(loss ASC, piece DESC). The full-EM expected counts are FLOATS, which a
distributed float sum would make partition-order-dependent — so the
posterior marginals are quantized per (word, piece) onto an integer grid
(``grid`` units = 1.0) inside the UDF and summed as BIGINT: exact,
associative, order-independent. Every tie-break is total, so the learned
vocabulary is engine- and partitioning-independent — pinned in
tests/test_unigram.py against an independent pure-Python implementation
(both modes).

The reference ETL (/root/reference) has no tokenizer; this extends the
engine per the north-star LLM-pipeline mandate alongside BPE.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts


def seed_pieces(
    words: DataFrame, max_piece_len: int = 6, n_seed: int = 400
) -> list[tuple[str, int]]:
    """Seed vocabulary from the (word, cnt) table: every substring of
    length <= max_piece_len, weighted by the count of the word it came
    from (a substring occurring twice in one word counts twice). Returns
    the n_seed heaviest pieces (count DESC, piece ASC) UNION all single
    characters, as [(piece, count)].

    Vocabulary-sized job: the explode fans out O(|word| * max_piece_len)
    rows per DISTINCT word — independent of corpus size."""
    subs = words.select(
        F.explode(
            F.expr(
                f"""
                flatten(transform(
                  sequence(1, length(word)),
                  i -> transform(
                    sequence(1, least({int(max_piece_len)},
                                      length(word) - i + 1)),
                    l -> substring(word, i, l))))
                """
            )
        ).alias("piece"),
        "cnt",
    )
    counts = subs.groupBy("piece").agg(F.sum("cnt").alias("c"))
    top = counts.orderBy(F.col("c").desc(), "piece").limit(n_seed).collect()
    chars = (
        counts.filter(F.length("piece") == 1)
        .orderBy(F.col("c").desc(), "piece")
        .collect()
    )
    seen: dict[str, int] = {}
    for r in list(top) + list(chars):
        seen.setdefault(r["piece"], int(r["c"]))
    return sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))


def viterbi_segment(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize the sum
    of piece log-probs via left-to-right DP. Deterministic: candidates are
    tried in ascending piece-length order and improvement is STRICT, so
    equal-score ties keep the shortest-piece-first decomposition. Unknown
    single characters fall back to a large negative score so any word
    segments (the UNK convention). Pure function — duplicated closure-local
    inside the pandas UDF below and mirrored by the pure-Python twin in
    tests; keep the three in lockstep."""
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
                score = NEG  # unknown single char: segmentable, terrible
            cand = best[start] + score
            if cand > best[end]:
                best[end] = cand
                back[end] = start
    out: list[str] = []
    end = n
    while end > 0:
        start = back[end]
        out.append(word[start:end])
        end = start
    return out[::-1]


def _viterbi_pieces_udf(logp: dict[str, float], max_len: int):
    """pandas UDF word -> array of best-segmentation pieces. The log-prob
    table travels by value in the closure (O(n_seed) floats)."""
    from pyspark.sql.functions import pandas_udf

    _logp = dict(logp)
    _max_len = int(max_len)

    @pandas_udf("array<string>")
    def segment(words):  # pd.Series -> pd.Series
        import pandas as _pd

        def _vit(word):
            n = len(word)
            NEG = -1e9
            best = [0.0] + [float("-inf")] * n
            back = [0] * (n + 1)
            for end in range(1, n + 1):
                for plen in range(1, min(_max_len, end) + 1):
                    start = end - plen
                    piece = word[start:end]
                    score = _logp.get(piece)
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

        return _pd.Series([_vit(w) for w in words])

    return segment


def _logprobs(counts: dict[str, int]) -> dict[str, float]:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def em_piece_counts(
    words: DataFrame, logp: dict[str, float], max_len: int
) -> dict[str, int]:
    """One E-step: Viterbi-segment every distinct word, emit count-weighted
    piece frequencies. Distributed over the vocabulary; the result is the
    O(active pieces) dict the driver-side M-step renormalizes."""
    seg = _viterbi_pieces_udf(logp, max_len)
    rows = (
        words.select(F.explode(seg(F.col("word"))).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in rows}


def forward_backward_counts(
    word: str, logp: dict[str, float], max_len: int, grid: int
) -> dict[str, int]:
    """Kudo's exact E-step for ONE word occurrence: forward/backward sums
    over the segmentation lattice, posterior marginal for every in-vocab
    piece occurrence, accumulated per piece and quantized onto the integer
    ``grid`` (sum-then-round per (word, piece), so multi-occurrence pieces
    round once). Unknown single characters participate with the same large
    negative UNK score as Viterbi so every word has a nonzero-probability
    lattice. Pure function — duplicated closure-local inside the pandas UDF
    below and mirrored by the pure-Python twin in tests; keep in lockstep."""
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
    post: dict[str, float] = {}
    for start in range(n):
        for plen in range(1, min(max_len, n - start) + 1):
            piece = word[start : start + plen]
            s = logp.get(piece)  # only REAL vocab pieces earn counts
            if s is None:
                continue
            post[piece] = post.get(piece, 0.0) + math.exp(
                alpha[start] + s + beta[start + plen] - z
            )
    out = {p: int(round(v * grid)) for p, v in post.items()}
    return {p: c for p, c in out.items() if c > 0}


def _fb_counts_udf(logp: dict[str, float], max_len: int, grid: int):
    """pandas UDF word -> array<struct<piece,ec>> of grid-quantized expected
    counts for ONE occurrence of the word (the caller multiplies by the
    word's corpus count — exact BIGINT arithmetic)."""
    from pyspark.sql.functions import pandas_udf

    _logp = dict(logp)
    _max_len = int(max_len)
    _grid = int(grid)

    @pandas_udf("array<struct<piece:string,ec:long>>")
    def expected(words):  # pd.Series -> pd.Series
        import math as _math

        import pandas as _pd

        def _fb(word):
            n = len(word)
            NEG = -1e9

            def lse(xs):
                m = max(xs)
                if m == float("-inf"):
                    return m
                return m + _math.log(sum(_math.exp(x - m) for x in xs))

            def score(piece):
                s = _logp.get(piece)
                if s is None:
                    return NEG if len(piece) == 1 else None
                return s

            alpha = [0.0] + [float("-inf")] * n
            for end in range(1, n + 1):
                cands = []
                for plen in range(1, min(_max_len, end) + 1):
                    s = score(word[end - plen : end])
                    if s is not None:
                        cands.append(alpha[end - plen] + s)
                if cands:
                    alpha[end] = lse(cands)
            beta = [float("-inf")] * n + [0.0]
            for start in range(n - 1, -1, -1):
                cands = []
                for plen in range(1, min(_max_len, n - start) + 1):
                    s = score(word[start : start + plen])
                    if s is not None:
                        cands.append(s + beta[start + plen])
                if cands:
                    beta[start] = lse(cands)
            z = alpha[n]
            post = {}
            for start in range(n):
                for plen in range(1, min(_max_len, n - start) + 1):
                    piece = word[start : start + plen]
                    s = _logp.get(piece)
                    if s is None:
                        continue
                    post[piece] = post.get(piece, 0.0) + _math.exp(
                        alpha[start] + s + beta[start + plen] - z
                    )
            return [
                {"piece": p, "ec": c}
                for p, v in post.items()
                if (c := int(round(v * _grid))) > 0
            ]

        return _pd.Series([_fb(w) for w in words])

    return expected


def em_expected_counts(
    words: DataFrame, logp: dict[str, float], max_len: int, grid: int
) -> dict[str, int]:
    """One EXACT E-step: forward-backward every distinct word, sum the
    grid-quantized per-occurrence expected counts weighted by word
    frequency. All post-UDF arithmetic is BIGINT (ec * cnt, then SUM), so
    the result is independent of partitioning and aggregation order —
    floats never cross a shuffle."""
    fb = _fb_counts_udf(logp, max_len, grid)
    rows = (
        words.select(F.explode(fb(F.col("word"))).alias("pe"), "cnt")
        .select(
            F.col("pe.piece").alias("piece"),
            (F.col("pe.ec") * F.col("cnt")).alias("wec"),
        )
        .groupBy("piece")
        .agg(F.sum("wec").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in rows}


def prune_by_loss(
    counts: dict[str, int],
    chars: set[str],
    keep_multi: int,
    max_len: int,
) -> dict[str, int]:
    """SentencePiece's likelihood-loss prune (unigram_model_trainer's
    PruneSentencePieces, public algorithm): for each multi-char piece x
    with frequency F, Viterbi-segment x's own string with x EXCLUDED (its
    best alternative decomposition), and score how much the corpus
    log-likelihood drops if x's occurrences re-segment that way:

        loss(x) = F * (log(F) - log(vsum)
                       - sum_a [log(freq_a + F) - log(vsum + F*(|alt|-1))])

    Pieces with zero frequency drop first; single chars always survive.
    Driver-side O(vocab * len^2): counts are integers, so the ranking is
    deterministic; ties drop the lexicographically-latest piece."""
    floored = {p: max(c, 1) for p, c in counts.items()}
    logp = _logprobs(floored)
    vsum = float(sum(floored.values()))
    scored: list[tuple[float, str]] = []
    for p, c in counts.items():
        if len(p) == 1:
            continue
        if c <= 0:
            scored.append((float("-inf"), p))
            continue
        alt_logp = dict(logp)
        alt_logp.pop(p, None)
        alt = viterbi_segment(p, alt_logp, max_len)
        fx = float(c)
        logprob_sp = math.log(fx) - math.log(vsum)
        logsum_alt = math.log(vsum + fx * (len(alt) - 1))
        logprob_alt = sum(
            math.log(float(floored.get(a, 1)) + fx) - logsum_alt for a in alt
        )
        scored.append((fx * (logprob_sp - logprob_alt), p))
    # keep the HIGHEST-loss pieces (most costly to remove); ties keep the
    # lexicographically-earliest — total order over (loss, piece)
    scored.sort(key=lambda lp: (-lp[0], lp[1]))
    kept = {p for _, p in scored[:keep_multi]}
    out = {p: c for p, c in counts.items() if p in kept}
    out.update({p: c for p, c in counts.items() if p in chars})
    return out


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 6,
    n_seed: int = 400,
    em_rounds: int = 2,
    shrink: float = 0.75,
    em_mode: str = "viterbi",
    prune_mode: str = "count",
    grid: int = 1_000_000,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary of ``vocab_size`` entries.
    Returns [(piece, logp)] ordered by (logp DESC, piece ASC).

    Each prune cycle: ``em_rounds`` E-step/M-step passes (one distributed
    vocabulary-sized job per pass; hard Viterbi counts or exact
    forward-backward expected counts per ``em_mode``), then prune
    multi-char pieces to ceil(|V| * shrink) by count or by SentencePiece
    likelihood loss per ``prune_mode`` (all single chars always survive).
    Driver state is O(n_seed); corpus is scanned exactly once."""
    if em_mode not in ("viterbi", "full"):
        raise ValueError(f"em_mode must be 'viterbi' or 'full', got {em_mode!r}")
    if prune_mode not in ("count", "loss"):
        raise ValueError(
            f"prune_mode must be 'count' or 'loss', got {prune_mode!r}"
        )
    words = word_counts(docs).localCheckpoint(eager=False)
    counts = dict(seed_pieces(words, max_piece_len, n_seed))
    chars = {p for p in counts if len(p) == 1}
    if em_mode == "full":
        # seeds join the expected-count integer grid so every EM/prune
        # round sees one unit scale (grid units = 1.0 expected occurrence)
        counts = {p: c * grid for p, c in counts.items()}

    def estep(cts: dict[str, int]) -> dict[str, int]:
        if em_mode == "full":
            new = em_expected_counts(words, _logprobs(cts), max_piece_len, grid)
        else:
            new = em_piece_counts(words, _logprobs(cts), max_piece_len)
        # pieces that won no path keep count 0 -> pruned first; single
        # chars keep a floor of 1 unit so they stay segmentable
        return {p: new.get(p, 1 if p in chars else 0) for p in cts}

    def prune_to(counts: dict[str, int], keep_multi: int) -> dict[str, int]:
        if prune_mode == "loss":
            return prune_by_loss(counts, chars, keep_multi, max_piece_len)
        multi = [(p, c) for p, c in counts.items() if len(p) > 1]
        # drop the LIGHTEST multi-char pieces; ties drop the
        # lexicographically-latest so the survivor set is deterministic
        multi.sort(key=lambda kv: (-kv[1], kv[0]))
        kept = dict(multi[:keep_multi])
        kept.update({p: c for p, c in counts.items() if p in chars})
        return kept

    target_multi = max(0, vocab_size - len(chars))
    while True:
        for _ in range(em_rounds):
            counts = estep(counts)
        n_multi = sum(1 for p in counts if len(p) > 1 and counts[p] > 0)
        if n_multi <= target_multi:
            counts = prune_to(counts, target_multi)
            break
        counts = prune_to(counts, max(target_multi, int(n_multi * shrink)))

    counts = estep(counts)
    counts = {p: c for p, c in counts.items() if c > 0 or p in chars}
    logp = _logprobs({p: max(c, 1) for p, c in counts.items()})
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def encode_token_counts_unigram(
    docs: DataFrame, pieces: list[tuple[str, float]], max_piece_len: int = 6
) -> DataFrame:
    """Segment the corpus with a trained piece table and count pieces per
    document: (doc_id, n_tokens_ws, n_tokens_unigram). Viterbi runs once
    per DISTINCT word (vocabulary-sized), broadcast back onto the token
    stream — the corpus is never re-segmented row by row (same shape as
    bpe.encode_token_counts)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.length("word") > 0)
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    seg = _viterbi_pieces_udf(dict(pieces), max_piece_len)
    encoded = vocab.select("word", F.size(seg(F.col("word"))).alias("n_sub"))
    return (
        toks.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_ws"),
            F.sum("n_sub").alias("n_tokens_unigram"),
        )
    )
