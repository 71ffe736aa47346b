"""Bloom-filter semi-join reduction built from builtin expressions.

The classic 100 TB join optimization: before shuffling a huge fact table
into a join, drop the rows whose key cannot possibly match, using a compact
bitmap built from the (much smaller) dim side. Spark's own runtime row-level
filtering does this only when the planner's heuristics fire; this operator
makes the technique an explicit, composable API — and it never leaves the
DataFrame layer, so the whole thing is Catalyst-visible codegen:

1. build: dim keys → k hashed bit positions each → ``explode`` into
   (word, mask) pairs → ``bit_or`` per 32-bit word → a word table of
   ≤ n_bits/32 rows, independent of dim cardinality. Each word row is an
   int key + bigint word (4+8 payload bytes per 32 filter bits, i.e.
   ≥ n_bits/4 bytes of payload before hash-relation overhead): ~24 KiB at
   the 2^16 default and ~24 MiB / 2 M rows at the 2^26 cap — still a cheap
   broadcast relative to the fact-table shuffle it removes, but the reason
   the cap stops at 2^26 rather than growing with the dim.
2. probe: one broadcast-hash join per probe hash against that word table
   (O(1) hash-table lookups — never a map element_at, whose linear scan
   made big bitmaps quadratic) keeps rows where all k probe bits are
   set. False positives pass (and are removed by the real join that
   follows); false negatives cannot happen, so correctness is exactly
   that of the unreduced join — which is what lets q_join_bloom
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


def bloom_bits_for(n_keys: int, bits_per_key: int = 10, cap_bits: int = 1 << 26) -> int:
    """Power-of-two bitmap size for ``n_keys``: ~``bits_per_key`` bits each
    (fpp ≈ 5 % at k=2 hashes), floored at DEFAULT_BITS and capped at
    ``cap_bits`` (2^26 = 8 MiB — past that the bitmap itself stops being a
    cheap broadcast and the caller should prefer a plain shuffle join).
    A bloom sized below its key count is WORSE than none: every bit sets,
    every probe passes, and the fact side pays hash compute for zero
    filtering — size from a real count, never a guess."""
    need = max(1, int(n_keys)) * bits_per_key
    bits = DEFAULT_BITS
    while bits < need and bits < cap_bits:
        bits <<= 1
    return bits


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
    """Aggregate the key set into a ``(_bloom_w int, _bloom_bits bigint)``
    word table — ≤ n_bits/32 rows, one shuffle of tiny (word, mask) pairs
    with map-side bit_or combine. Words no key hashes into are absent;
    the probe's inner join treats absent as all-zero (definitely not
    present). Kept as a DataFrame, not a collected map: the probe
    broadcast-hash-joins it for O(1) lookups at any bitmap size."""
    entries = []
    for seed in range(n_hashes):
        word, mask = _bit_position(F.col(key_col), seed, n_bits)
        entries.append(F.struct(word.alias("w"), mask.alias("m")))
    pairs = keys.select(F.explode(F.array(*entries)).alias("e")).select(
        F.col("e.w").alias("_bloom_w"), F.col("e.m").alias("m")
    )
    return pairs.groupBy("_bloom_w").agg(F.bit_or("m").alias("_bloom_bits"))


def bloom_probe(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Keep fact rows whose key may be in the set the bloom was built from.

    One broadcast-hash INNER JOIN per probe hash: the fact row computes its
    word index, the join finds that word's 32-bit chunk in O(1) (a real
    hash-table lookup), and the mask test is plain bitwise codegen. A fact
    key whose word is absent from the build simply doesn't join — absent
    word = all bits zero = provably not in the set — so the inner join IS
    the filter. The former representation (single-row map<int,bigint>
    probed with element_at) was quadratic in disguise: Spark's GetMapValue
    is a LINEAR scan of the map, fine at 2^16 bits (2 k words) and
    catastrophic once bloom_bits_for sizes the bitmap for a real dim
    (2^22 bits = 131 k words scanned per probe, per row)."""
    side = F.broadcast(bloom.select("_bloom_w", "_bloom_bits"))
    out = fact
    for seed in range(n_hashes):
        word, mask = _bit_position(F.col(key_col), seed, n_bits)
        # join the IDENTICAL broadcast plan each round (no per-seed column
        # renames): Spark's ReusedExchange then ships and computes the word
        # table once, not once per probe hash
        out = (
            out.join(side, word == F.col("_bloom_w"), "inner")
            .filter(F.col("_bloom_bits").bitwiseAND(mask) != 0)
            .drop("_bloom_w", "_bloom_bits")
        )
    return out
