"""Bloom-filter semi-join reduction built from builtin expressions.

The classic 100 TB join optimization: before shuffling a huge fact table
into a join, drop the rows whose key cannot possibly match, using a compact
bitmap built from the (much smaller) dim side. Spark's own runtime row-level
filtering does this only when the planner's heuristics fire; this operator
makes the technique an explicit, composable API — and it never leaves the
DataFrame layer, so the whole thing is Catalyst-visible codegen:

1. build: dim keys → k hashed bit positions each → ``explode`` into
   (word, mask) pairs → ``bit_or`` per 64-bit word → one row holding a
   ``map<int,bigint>`` bitmap. Size is n_bits/8 bytes regardless of dim
   cardinality — for the default 2^16 bits, 8 KiB.
2. probe: broadcast that single row to the fact side (a 1-row broadcast
   nested-loop join, i.e. a shipped constant) and keep rows where all k
   probe bits are set. False positives pass (and are removed by the real
   join that follows); false negatives cannot happen, so correctness is
   exactly that of the unreduced join — which is what lets q_join_bloom
   hash-match a plain-join DuckDB oracle.

Hash = xxhash64(key, seed_lit) — the same JVM-side hash family the engine
uses for LSH banding; probes compile into whole-stage codegen (no UDF).

Reference analogue: none (the reference has no joins); this belongs to the
engine's declared scale surface, SURVEY.md §2C pipeline ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 16
DEFAULT_HASHES = 2


def _bit_position(key: Column, seed: int, n_bits: int) -> tuple[Column, Column]:
    """(word index, bit mask) of hash_seed(key) in an n_bits bitmap.

    Words are 32 bits wide (not 64): the mask comes from pow(2, bit) — the
    shiftleft builtin only takes a literal shift amount — and doubles
    represent 2^b exactly for b < 53, so 32 keeps the cast exact with
    headroom while staying sign-bit-safe in the bigint word."""
    h = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
    word = F.floor(h / 32).cast("int")
    mask = F.pow(F.lit(2.0), F.pmod(h, F.lit(32))).cast("bigint")
    return word, mask


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Aggregate the key set into a single-row ``{_bloom: map<int,bigint>}``.

    Two shuffles of tiny data: (word, mask) pairs → per-word ``bit_or``
    (≤ n_bits/64 rows), then a 1-row map_from_entries collect. Words no key
    hashes into are absent from the map — the probe treats absent as 0."""
    entries = []
    for seed in range(n_hashes):
        word, mask = _bit_position(F.col(key_col), seed, n_bits)
        entries.append(F.struct(word.alias("w"), mask.alias("m")))
    pairs = keys.select(F.explode(F.array(*entries)).alias("e")).select(
        F.col("e.w").alias("w"), F.col("e.m").alias("m")
    )
    words = pairs.groupBy("w").agg(F.bit_or("m").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("_bloom")
    )


def bloom_probe(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Keep fact rows whose key may be in the set the bloom was built from.

    The bitmap arrives as a broadcast single-row join (a constant shipped
    to every task); the k probe expressions are plain bitwise codegen, so
    the filter runs at scan speed BEFORE the join shuffle it protects."""
    probed = fact.crossJoin(F.broadcast(bloom))
    cond: Column | None = None
    for seed in range(n_hashes):
        word, mask = _bit_position(F.col(key_col), seed, n_bits)
        hit = (
            F.coalesce(F.element_at(F.col("_bloom"), word), F.lit(0).cast("bigint"))
            .bitwiseAND(mask)
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    assert cond is not None
    return probed.filter(cond).drop("_bloom")
