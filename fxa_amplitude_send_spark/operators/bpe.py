"""Distributed BPE tokenizer training (Sennrich et al. 2016, public
algorithm) as iterative Spark aggregates.

The corpus-scale step is ONE word-frequency aggregate (shuffle proportional
to vocabulary, not corpus — map-side combine does the heavy lifting). Merge
learning then iterates over the vocabulary-sized (symbols, count) table:
each round is a single pair-frequency aggregate plus a driver-side argmax of
one row, and the chosen merge is applied with a codegen'd array fold — no
Python UDFs anywhere. This is the textbook scale split: at 100 TB the word
count costs a corpus scan; every training round after that costs O(|vocab|).

The reference ETL (/root/reference) has no tokenizer; this extends the
engine per the north-star LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F



def word_counts(docs: DataFrame) -> DataFrame:
    """(word, cnt) over whitespace tokens — the only corpus-sized job."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


EOW = "</w>"  # Sennrich-style end-of-word marker symbol


def initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into single-character symbols plus an explicit
    end-of-word marker: (word, syms, cnt). The marker lets merges learn
    whole-word tokens, per the published algorithm."""
    chars = F.filter(F.split(F.col("word"), "(?!^)"), lambda x: F.length(x) > 0)
    return words.select(
        "word", F.concat(chars, F.array(F.lit(EOW))).alias("syms"), "cnt"
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) ->
    left+right inside a symbol array, as a pure codegen'd fold. try_element_at
    keeps the empty-accumulator probe null-safe under ANSI mode."""
    la, lb, lab = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == la) & (x == lb),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count: (left, right, total).
    The explode fans out |word|-1 rows per vocabulary entry — vocabulary-sized
    input, so this is a small job regardless of corpus size."""
    pairs = symbols.select(
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN transform("
                "  sequence(1, size(syms) - 1),"
                "  i -> struct(element_at(syms, i) AS left,"
                "              element_at(syms, CAST(i AS INT) + 1) AS right))"
                " ELSE array() END"
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("cnt").alias("total")
    )


def train_bpe(docs: DataFrame, n_merges: int) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, final_symbols) where
    merges is [(left, right, pair_count)] in learned order.

    Determinism: ties on pair frequency break lexicographically on
    (left, right). One driver action per round (the 1-row argmax collect);
    the symbols table is localCheckpoint'ed per round so the plan stays O(1)
    deep instead of accreting one fold per round."""
    symbols = initial_symbols(word_counts(docs)).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(symbols)
            .orderBy(F.col("total").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, total = top[0]["left"], top[0]["right"], int(top[0]["total"])
        merges.append((left, right, total))
        symbols = symbols.select(
            "word", _merge_fold(F.col("syms"), left, right).alias("syms"), "cnt"
        ).localCheckpoint(eager=False)
    return merges, symbols


def encode_token_counts(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Apply learned merges to the corpus and count BPE tokens per document:
    (doc_id, n_tokens_ws, n_tokens_bpe). Encoding runs once per DISTINCT word
    (vocabulary-sized fold chain), then broadcast-joins back onto the token
    stream — the corpus is never re-encoded row by row."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.length("word") > 0)
    vocab = initial_symbols(toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    syms = F.col("syms")
    for left, right, _ in merges:
        syms = _merge_fold(syms, left, right)
    encoded = vocab.select("word", F.size(syms).alias("n_sub"))
    return (
        toks.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_ws"),
            F.sum("n_sub").alias("n_tokens_bpe"),
        )
    )
