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
  2. EM rounds: the E-step Viterbi-segments each DISTINCT word under the
     current piece log-probs and emits hard piece counts (the standard
     Viterbi-EM approximation of Kudo's full forward-backward; counts are
     weighted by word frequency). Viterbi is a per-word DP that built-in
     expressions cannot state, so it runs as ONE Arrow-batched pandas UDF
     over the vocabulary — closure-local code only (executors do not have
     the repo on sys.path). The M-step renormalizes counts into log-probs
     on the driver: the piece table is O(n_seed) rows, the same
     bounded-driver-state contract as the BPE argmax and the IVF k-means.
  3. Prune: drop the lowest-probability multi-character pieces (single
     chars are never dropped — segmentability invariant) by ``shrink`` per
     round until ``vocab_size`` remains, then run a final EM pass.

Determinism: seed selection orders by (count DESC, piece ASC); Viterbi
improvement is strict (ties keep the FIRST candidate in ascending
piece-length order); prune orders by (count ASC, piece DESC). Every
tie-break is total, so the learned vocabulary is engine- and
partitioning-independent — pinned in tests/test_unigram.py against an
independent pure-Python implementation.

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


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 6,
    n_seed: int = 400,
    em_rounds: int = 2,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary of ``vocab_size`` entries.
    Returns [(piece, logp)] ordered by (logp DESC, piece ASC).

    Each prune cycle: ``em_rounds`` Viterbi-EM passes (one distributed
    vocabulary-sized job per pass), then keep the ceil(|V| * shrink)
    highest-count pieces among multi-char pieces (all single chars always
    survive). Driver state is O(n_seed); corpus is scanned exactly once."""
    words = word_counts(docs).localCheckpoint(eager=False)
    counts = dict(seed_pieces(words, max_piece_len, n_seed))
    chars = {p for p in counts if len(p) == 1}

    def prune_to(counts: dict[str, int], keep_multi: int) -> dict[str, int]:
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
            new_counts = em_piece_counts(words, _logprobs(counts), max_piece_len)
            # pieces that won no Viterbi path keep count 0 -> pruned first;
            # single chars keep a floor of 1 so they stay segmentable
            counts = {
                p: new_counts.get(p, 1 if p in chars else 0) for p in counts
            }
        n_multi = sum(1 for p in counts if len(p) > 1 and counts[p] > 0)
        if n_multi <= target_multi:
            counts = prune_to(counts, target_multi)
            break
        counts = prune_to(counts, max(target_multi, int(n_multi * shrink)))

    final = em_piece_counts(words, _logprobs(counts), max_piece_len)
    counts = {p: final.get(p, 1 if p in chars else 0) for p in counts}
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
