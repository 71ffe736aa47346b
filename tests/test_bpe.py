"""BPE tokenizer training: the distributed trainer must reproduce, merge for
merge, an independent pure-Python implementation of the published algorithm
(Sennrich et al. 2016) run on the identical corpus — including pair counts
and the deterministic (count desc, pair asc) tie-break."""

from __future__ import annotations

from collections import Counter

import duckdb

from fxa_amplitude_send_spark.operators.bpe import (
    EOW,
    encode_token_counts,
    train_bpe,
)
from fxa_amplitude_send_spark.plans import all_queries
from fxa_amplitude_send_spark.sources import load_table

N = 12


def _py_word_counts(sf_dir: str) -> Counter:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wc: Counter = Counter()
    for (text,) in rows:
        for w in text.split(" "):
            if w:
                wc[w] += 1
    return wc


def _py_train(wc: Counter, n_merges: int):
    """Reference BPE: symbol sequences = chars + EOW; each round counts
    adjacent pairs weighted by word frequency, merges the argmax pair
    (ties broken lexicographically), greedy left-to-right application."""
    vocab = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        (a, b), total = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, total))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_merges_match_reference(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    got, _ = train_bpe(docs, N)
    expected, _ = _py_train(_py_word_counts(sf_smoke), N)
    assert got == expected


def test_bpe_encode_counts_match_reference(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    merges, _ = train_bpe(docs, N)
    _, vocab = _py_train(_py_word_counts(sf_smoke), N)
    enc = {w: len(syms) for w, syms in vocab.items()}

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    expected = {
        doc_id: sum(enc[w] for w in text.split(" ") if w) for doc_id, text in rows
    }

    got = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in encode_token_counts(docs, merges).collect()
    }
    assert got == expected


def test_bpe_query_registered_and_deterministic(spark, sf_smoke):
    m = all_queries()["llm_bpe_train"](spark, sf_smoke).collect()
    assert len(m) == N
    ranks = [r["merge_rank"] for r in m]
    assert ranks == list(range(1, N + 1))
    # merged token is the concatenation; counts strictly positive and
    # non-increasing is NOT guaranteed by BPE, but positivity is.
    assert all(r["merged"] == r["left"] + r["right"] and r["pair_count"] > 0 for r in m)


def test_fixed_merges_confluent_by_construction():
    """llm_bpe_encode_fixed's oracle replays the greedy fold as
    replace-until-fixpoint, which equals the engine's single left-greedy
    pass ONLY when no rule has left == right (self-overlapping patterns
    make odd symbol runs >= 5 order-ambiguous). Guard the invariant."""
    from fxa_amplitude_send_spark.plans.corpus import FIXED_MERGES

    assert all(left != right for left, right, _ in FIXED_MERGES)


def test_fixed_encode_fold_equals_fixpoint(spark):
    """The engine fold and the oracle's replace-until-fixpoint must agree
    word-for-word on adversarial inputs (boundary-shared occurrences,
    chained rules, rule products feeding later rules)."""
    from pyspark.sql import functions as F

    from fxa_amplitude_send_spark.operators.bpe import (
        _merge_fold,
        initial_symbols,
    )
    from fxa_amplitude_send_spark.plans.corpus import FIXED_MERGES

    words = [
        "value", "valuevalue", "the", "than", "scan", "scanscan",
        "vava", "vavava", "aaaa", "thth", "anan", "valval", "a", "v",
    ]

    def fixpoint(word: str) -> int:
        s = "|" + "|".join(list(word)) + "|</w>|"
        for left, right, _ in FIXED_MERGES:
            pat, rep = f"|{left}|{right}|", f"|{left}{right}|"
            while True:
                s2 = s.replace(pat, rep)
                if s2 == s:
                    break
                s = s2
        return s.count("|") - 1

    df = spark.createDataFrame([(w, 1) for w in words], "word string, cnt int")
    syms = F.col("syms")
    for left, right, _ in FIXED_MERGES:
        syms = _merge_fold(syms, left, right)
    got = {
        r["word"]: r["n"]
        for r in initial_symbols(df).select("word", F.size(syms).alias("n")).collect()
    }
    assert got == {w: fixpoint(w) for w in words}
