"""Training-data curation operators: weighted source mixing, stratified /
uniform sampling, sequence packing, and TF-IDF term weighting.

These are the corpus-assembly steps that sit between dedup/quality filtering
(plans/llm.py) and the trainer: decide how much of each source to keep,
rebalance languages, pack documents into fixed token-budget sequences, and
surface each document's most characteristic terms.

Determinism discipline: every sampling decision derives from a multiplicative
hash of doc_id — ``h(id) = (id * odd_const) mod 2^32`` (Fibonacci hashing;
an odd multiplier is invertible mod 2^32 so distinct ids never collide).
Pure integer arithmetic evaluates identically in Spark and DuckDB, which is
what makes these *sampling* operators oracle-checkable at all — no rand(),
no engine-specific hash builtin. Different operators use different odd
multipliers so their keep/drop decisions are mutually independent.

Scale notes are per-operator; the common theme is that every decision is a
narrow per-row expression (no shuffle) and every aggregate is map-side
combinable, so the operators are scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# Odd 32-bit multipliers (Knuth / xxhash primes) — one per operator family.
_MIX_MULT = 2654435761
_STRAT_MULT = 2246822519
_SAMPLE_MULT = 3266489917
_MOD = 4294967296  # 2^32


_PREMOD = 2147483648  # 2^31: bounds (id % 2^31) * mult < 2^62 — no int64
# overflow (ANSI error) at any id; identical output for id < 2^31


def _h(col, mult: int):
    """Deterministic uniform hash in [0, 2^32): ((id mod 2^31) * mult)
    mod 2^32. The pre-reduction keeps the product inside int64 for
    arbitrarily large ids (a raw id*mult overflows past id ≈ 3.4e9 —
    reachable at trillion-row scale) without changing any value for
    ids below 2^31."""
    return ((col.cast("long") % F.lit(_PREMOD)) * F.lit(mult)) % F.lit(_MOD)


@query(
    "llm_source_mix",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, lang,
             ((doc_id % {_PREMOD}) * {_MIX_MULT}) % {_MOD} AS h
      FROM documents
    ), weighted AS (
      SELECT doc_id, source, lang,
             CASE
               WHEN source IN ('src0', 'src1', 'src2')
                 THEN 1 + CASE WHEN h % 1000 < 600 THEN 1 ELSE 0 END
               WHEN source IN ('src3', 'src4', 'src5') THEN 1
               ELSE CASE WHEN h % 1000 < 400 THEN 1 ELSE 0 END
             END AS n_copies
      FROM base
    )
    SELECT doc_id, source, lang,
           CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_n
    FROM weighted
    WHERE n_copies >= 1
    """,
)
def llm_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: each source gets a target weight and documents
    are up- or down-sampled to hit it — weight 1.6 emits a second copy of 60%
    of rows (hash-decided), weight 0.4 keeps 40%. This is the standard
    corpus-mixture step (e.g. upweight curated sources, downweight crawl).

    Scale: the decision is a per-row integer expression and the upsample is a
    row-local explode — zero shuffle, output size = sum(weights·rows). The
    weights table here is a literal CASE; in production it would be a
    broadcast-joined dimension of O(sources) rows."""
    docs = load_table(spark, sf_dir, "documents")
    h = _h(F.col("doc_id"), _MIX_MULT)
    extra = lambda permille: F.when(h % 1000 < permille, 1).otherwise(0)  # noqa: E731
    n_copies = (
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(1) + extra(600))
        .when(F.col("source").isin("src3", "src4", "src5"), F.lit(1))
        .otherwise(extra(400))
    )
    return (
        docs.select("doc_id", "source", "lang", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            "lang",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_copies").cast("long"))
            ).alias("copy_n"),
        )
    )


@query(
    "llm_sample_stratified",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM (
      SELECT doc_id, source, lang,
             ((doc_id % {_PREMOD}) * {_STRAT_MULT}) % {_MOD} AS h
      FROM documents
    )
    WHERE h % 1000 < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 800 ELSE 1000 END
    """,
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) sampling to rebalance a corpus: keep 30% of
    the dominant 'en' stratum, 80% of 'de', all of the rest. The keep
    decision is a deterministic hash threshold, so the sample is reproducible
    run-to-run and engine-to-engine — a hard requirement for training-data
    lineage.

    Scale: a narrow filter — predicate-pushdown-friendly, no shuffle, and
    because the hash is per-row it needs no per-stratum state (contrast
    df.sampleBy, whose Bernoulli draw is seed- and partitioning-dependent)."""
    docs = load_table(spark, sf_dir, "documents")
    h = _h(F.col("doc_id"), _STRAT_MULT)
    rate = (
        F.when(F.col("lang") == "en", 300)
        .when(F.col("lang") == "de", 800)
        .otherwise(1000)
    )
    return docs.filter(h % 1000 < rate).select("doc_id", "source", "lang")


@query(
    "llm_sample_bottomk",
    oracle=f"""
    SELECT doc_id, source, lang, sort_key
    FROM (
      SELECT doc_id, source, lang,
             ((doc_id % {_PREMOD}) * {_SAMPLE_MULT}) % {_MOD} AS sort_key
      FROM documents
    )
    ORDER BY sort_key
    LIMIT 100
    """,
)
def llm_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform fixed-size sample via bottom-k-by-hash: the k rows with the
    smallest hash values are a uniform k-subset, and — unlike reservoir
    sampling — the choice is deterministic, mergeable across partitions, and
    stable under re-partitioning (the classic distributed-sample trick).

    Scale: Spark executes orderBy+limit as TakeOrderedAndProject — each
    partition keeps a local k-heap and only k rows per partition reach the
    driver-side merge; no global sort ever materializes."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            "lang",
            _h(F.col("doc_id"), _SAMPLE_MULT).alias("sort_key"),
        )
        .orderBy("sort_key")
        .limit(100)
    )


@query(
    "llm_seq_pack",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM toks
    )
    SELECT source,
           CAST(FLOOR(cum_before / 512.0) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM cum
    GROUP BY source, pack_id
    """,
)
def llm_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concatenate-then-chunk): within each source shard,
    documents are laid end-to-end in doc_id order and a document belongs to
    the fixed-token-budget pack its first token falls in — the standard
    pretraining packing layout (documents may straddle pack boundaries; the
    pack id marks where each one starts).

    Scale: the running sum is windowed PER SOURCE — one shuffle on the shard
    key, then each shard packs independently and in parallel. A single global
    ordering would serialize on one partition; sharded packing is how real
    pipelines do it (pack within input file/shard, never across the corpus).
    The final per-pack rollup is a map-side-combinable hash aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        cum.withColumn(
            "pack_id", F.floor(F.col("cum_before") / F.lit(512.0)).cast("long")
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "llm_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE len(token) > 0
      GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (
      SELECT COUNT(*) AS n_total FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROUND(tf.tf * LN(CAST(n.n_total AS DOUBLE) / df.df), 6) AS score
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, score, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
      FROM scored)
    WHERE rnk <= 3
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic keyword/fingerprint
    weighting (tf · ln(N/df)), used for topic tagging and near-dup triage.

    Scale: term frequencies aggregate map-side on (doc_id, token); document
    frequencies aggregate on token (shuffle bounded by vocabulary, not
    corpus); the corpus size joins in as a broadcast scalar. Ranking ties
    break on the rounded score then token text, so the top-3 set is total-
    ordered and engine-independent (raw float ordering would expose last-ulp
    differences between ln() implementations)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.length("token") > 0)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("n_total").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rnk")
    )


@query("llm_pq_codes")  # rows-only: learned codebooks are engine-specific
def llm_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode of the embedding corpus: 64 floats → 4
    one-byte codes (64× compression) plus per-vector reconstruction error —
    the storage format behind billion-scale ANN indexes (IVF-PQ).

    Codebooks train on a bounded driver-side sample (O(centroids), like the
    IVF coarse quantizer); the encode pass is one vectorized pandas UDF,
    fully distributed, no shuffle. Deterministic (fixed sample, first-k
    init, ties to lowest code) but the learned codebooks are engine-
    specific, so the check is rows-only."""
    from ..operators.quantization import encode_pq, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=4, k=16)
    return encode_pq(emb, books).select("vec_id", "pq_code", "recon_err")


def _r6(col):
    """Portable 6-decimal rounding: floor(x·1e6 + 0.5)/1e6 — pure double
    math, bitwise-identical across engines, immune to the decimal-tie
    divergence between Spark (half-up) and DuckDB ROUND (see
    q_window_dist)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


@query(
    "llm_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pairs AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
    ), counted AS (
      SELECT w1, w2, COUNT(*) AS n_pairs FROM pairs GROUP BY w1, w2
    )
    SELECT w1, w2, n_pairs,
           FLOOR(n_pairs / SUM(n_pairs) OVER (PARTITION BY w1)
                 * 1000000 + 0.5) / 1000000 AS p_cond
    FROM counted
    """,
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model: within-document adjacent token pairs →
    conditional probability P(w2|w1) = count(w1,w2)/count(w1,·) — the
    n-gram statistics pass behind contamination screens, perplexity
    proxies, and classic LM baselines.

    Pair extraction zips the token array against its own tail
    (slice + arrays_zip — regular codegen'd expressions, NOT a
    higher-order transform: HOF lambdas evaluate interpreted per element,
    which measured 2.3s vs 0.9s at sf0.1 for identical output). No window,
    no per-doc shuffle, order guaranteed by the array itself; counting is
    one map-side-combinable aggregate on (w1,w2); normalization is a
    window over w1 partitions, size-bounded by vocabulary not corpus."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1).alias("w1"),
        F.slice(t, 2, F.size(t) - 1).alias("w2"),
    )
    pairs = docs.select(F.explode(zipped).alias("p")).select("p.w1", "p.w2")
    counted = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pairs"))
    w = Window.partitionBy("w1")
    return counted.select(
        "w1",
        "w2",
        "n_pairs",
        _r6(F.col("n_pairs") / F.sum("n_pairs").over(w)).alias("p_cond"),
    )


@query(
    "llm_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pairs AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
    ), lm AS (
      SELECT w1, w2,
             COUNT(*) * 1.0
               / SUM(COUNT(*)) OVER (PARTITION BY w1) AS p_cond
      FROM pairs GROUP BY w1, w2
    )
    SELECT p.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(EXP(-AVG(LN(COALESCE(lm.p_cond, 0.000001)))), 4)
             AS perplexity
    FROM pairs p
    LEFT JOIN lm ON p.w1 = lm.w1 AND p.w2 = lm.w2
    GROUP BY p.doc_id
    """,
)
def llm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram perplexity under the corpus's own LM — the
    CCNet/Gopher-style quality signal (a doc whose token transitions are
    improbable under the corpus model is boilerplate, spam, or another
    language). perplexity = exp(−mean ln P(w2|w1)), floor 1e-6 for unseen
    pairs (none here since the LM is trained on the same corpus, but the
    backoff is part of the scoring contract for held-out data).

    Plan: one pair extraction feeds BOTH the LM aggregate and the scoring
    join (Catalyst reuses the codegen'd zip); the LM side is
    vocabulary²-bounded so the join's build side stays small relative to
    the corpus; the per-doc score is one mergeable aggregate. At 100 TB
    the LM table is the thing to persist and broadcast — score new shards
    against a frozen LM instead of recomputing it."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1).alias("w1"),
        F.slice(t, 2, F.size(t) - 1).alias("w2"),
    )
    pairs = docs.select(
        "doc_id", F.explode(zipped).alias("p")
    ).select("doc_id", "p.w1", "p.w2")
    w = Window.partitionBy("w1")
    lm = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "w1",
            "w2",
            (F.col("n_pairs") / F.sum("n_pairs").over(w)).alias("p_cond"),
        )
    )
    scored = pairs.join(lm, ["w1", "w2"], "left")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.exp(-F.avg(F.log(F.coalesce(F.col("p_cond"), F.lit(0.000001))))), 4
        ).alias("perplexity"),
    )


@query(
    "llm_vocab_build",
    oracle="""
    WITH counts AS (
      SELECT token, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
      ) WHERE length(token) > 0
      GROUP BY token
    )
    SELECT token, n,
           ROW_NUMBER() OVER (ORDER BY n DESC, token) AS vocab_rank,
           FLOOR(SUM(n) OVER (ORDER BY n DESC, token
                              ROWS UNBOUNDED PRECEDING)
                 / (SELECT SUM(n) FROM counts)
                 * 1000000 + 0.5) / 1000000 AS coverage
    FROM counts
    """,
)
def llm_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with cumulative corpus coverage — the
    tokenizer-building step that answers "how many types cover 99% of
    tokens". The global ordering runs over VOCABULARY-sized data (the
    token aggregate is corpus-bounded and map-side combined first), so the
    single-partition window is ordering thousands of rows, not the corpus;
    the corpus-total denominator joins in as a broadcast scalar."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_total"))
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n",
            F.row_number().over(w).alias("vocab_rank"),
            _r6(
                F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("_total")
            ).alias("coverage"),
        )
    )


@query("llm_quality_classifier")  # rows-only: iterative GD training is not SQL
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier (fastText-style doc filter) end-to-end on
    the cluster: codegen'd features (length, stopword ratio, mean token
    length, digit ratio), weak labels from the heuristic quality rule, then
    LOGISTIC REGRESSION trained by Newton/IRLS where each round is ONE
    mergeable aggregate over the persisted feature frame producing gradient
    + Hessian together (operators/classifier.py — the MLlib treeAggregate
    shape, no UDFs); 6 Newton rounds replace the earlier 25 GD rounds for a
    strictly better optimum at 4× fewer job launches (equivalence vs GD is
    pytest-checked). Output: per-doc label vs model prediction; accuracy
    floor ≥ 0.9 is pytest-asserted (tests/test_training.py). At 100 TB:
    features are one scan, each round reads the cached projection, state
    per partition is O(k²) independent of rows."""
    from ..operators.classifier import (
        feature_stats,
        score_logreg,
        train_logreg_newton,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks).cast("double")
    stops = ["the", "and", "of", "a", "to", "in", "is", "it"]
    stop_arr = F.array(*[F.lit(s) for s in stops])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
            "double"
        )
        / F.greatest(n_tokens, F.lit(1.0))
    )
    mean_tok_len = F.length("text").cast("double") / F.greatest(
        n_tokens, F.lit(1.0)
    )
    digit_ratio = (
        F.length(F.regexp_replace(F.col("text"), r"[^0-9]", "")).cast("double")
        / F.greatest(F.length("text").cast("double"), F.lit(1.0))
    )
    quality = (
        0.5 * F.least(n_tokens, F.lit(200.0)) / 200.0 + 0.5 * stop_ratio
    )
    feats = docs.select(
        "doc_id",
        n_tokens.alias("f_len"),
        stop_ratio.alias("f_stop"),
        mean_tok_len.alias("f_tok"),
        digit_ratio.alias("f_digit"),
        (quality > 0.17).cast("int").alias("label"),
    ).persist()
    cols = ["f_len", "f_stop", "f_tok", "f_digit"]
    try:
        # ONE standardization aggregate shared by training and scoring
        # (score_logreg would otherwise recompute the identical mu/sd on
        # the same frame — a whole extra job for the same constants)
        n, mu, sd = feature_stats(feats, cols)
        w = train_logreg_newton(feats, cols, "label", n_iter=6, stats=(n, mu, sd))
        scored = score_logreg(feats, cols, w, mu=mu, sd=sd)
        return scored.select(
            "doc_id",
            "label",
            "pred",
            (F.col("pred") == F.col("label")).cast("int").alias("correct"),
        )
    finally:
        feats.unpersist(blocking=False)


_SPLIT_MULT = 2484345967  # odd multiplier reserved for dataset splitting


@query(
    "llm_dataset_split",
    oracle=f"""
    SELECT doc_id, lang, source,
           CASE WHEN h % 100 < 90 THEN 'train'
                WHEN h % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang, source,
             ((doc_id % {_PREMOD}) * {_SPLIT_MULT}) % {_MOD} AS h
      FROM documents
    )
    """,
)
def llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by multiplicative hash
    of doc_id — reproducible across runs, engines and cluster sizes (no RNG,
    no per-partition state), and stable under appends: a document's split
    never changes when the corpus grows, which is the property that keeps
    eval sets uncontaminated across dataset versions. Pure codegen'd
    arithmetic; embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    h = _h(F.col("doc_id"), _SPLIT_MULT)
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.when(h % 100 < 90, F.lit("train"))
        .when(h % 100 < 95, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@query(
    "llm_curriculum",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             ((doc_id % {_PREMOD}) * {_SPLIT_MULT}) % {_MOD} AS h
      FROM documents
    ),
    tiered AS (
      SELECT doc_id, lang, n_tokens,
             NTILE(4) OVER (ORDER BY n_tokens, doc_id) AS tier, h
      FROM scored
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, tier,
           CAST(ROW_NUMBER() OVER (PARTITION BY tier ORDER BY h, doc_id)
                AS BIGINT) AS rank_in_tier
    FROM tiered
    """,
)
def llm_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: quartile difficulty tiers (proxy: token length —
    short to long, the classic length-based curriculum) with a deterministic
    hash-shuffled feed order inside each tier so training sees tiers in
    sequence but documents within a tier in reproducible pseudo-random
    order. NTILE over a unique (score, doc_id) ordering is deterministic in
    both engines. Note the global NTILE is a single-ordering window — at
    100 TB you'd replace it with approx_percentile tier boundaries
    (broadcast) + a per-partition rank, same contract; the registered form
    keeps the oracle exact."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        _h(F.col("doc_id"), _SPLIT_MULT).alias("h"),
    )
    tiered = scored.withColumn(
        "tier", F.ntile(4).over(Window.orderBy("n_tokens", "doc_id"))
    )
    return tiered.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "tier",
        F.row_number()
        .over(Window.partitionBy("tier").orderBy("h", "doc_id"))
        .cast("long")
        .alias("rank_in_tier"),
    )


def _bm25_dl_tf(docs: DataFrame, terms: list[str]):
    """The two token-stream aggregates of llm_bm25, PRE-checkpoint: document
    lengths and query-term frequencies. Factored out so the plan test can
    pin the query-term IN filter BELOW the (doc_id, token) aggregate —
    shuffled volume O(matching tokens), not O(corpus tokens) — which the
    checkpoint in llm_bm25 removes from the final plan text."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.length("token") > 0)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return dl, tf


@query(
    "llm_bm25",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tok2 AS (
      SELECT doc_id, token FROM tok WHERE len(token) > 0
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id
    ), stats AS (
      SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_total,
             (SELECT AVG(CAST(dl AS DOUBLE)) FROM dl) AS avgdl
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok2
      WHERE token IN ('hash', 'join', 'stream')
      GROUP BY doc_id, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), contrib AS (
      SELECT tf.doc_id,
             CAST(FLOOR(
               LN((s.n_total - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
               * 1e6 + 0.5) AS BIGINT) AS c_micro
      FROM tf
      JOIN dfreq USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    ), scored AS (
      SELECT doc_id, SUM(c_micro) AS micro FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, ROUND(micro / 1e6, 6) AS bm25, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY micro DESC, doc_id) AS rnk
      FROM scored)
    WHERE rnk <= 20
    """,
)
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Okapi, k1=1.2, b=0.75) for the fixed query
    {hash, join, stream} — the lexical-search scoring behind corpus search
    and retrieval-based decontamination.

    Scale: document length aggregates map-side per doc_id; term frequencies
    are computed only for the query terms (the filter lands BEFORE the
    (doc_id, token) aggregate, so the shuffled volume is O(matching tokens),
    not O(corpus tokens)); document frequencies and the corpus stats join in
    as broadcast scalars. Per-term contributions are fixed to an integer
    micro-score grid (floor(x*1e6+0.5) as BIGINT) and summed EXACTLY, so the
    ranking never depends on float summation order — the property that makes
    a distributed top-k reproducible run-to-run and engine-to-engine.
    """
    k1, b = 1.2, 0.75
    terms = ["hash", "join", "stream"]
    docs = load_table(spark, sf_dir, "documents")
    dl_raw, tf_raw = _bm25_dl_tf(docs, terms)
    # dl feeds the avgdl scalar AND the contrib join; tf feeds dfreq AND
    # contrib — uncheckpointed, each consumer re-ran the full corpus-token
    # explode (4 explode passes in one action). Both checkpoints are
    # aggregate outputs: O(docs) and O(query-term postings) rows, far
    # smaller than the token stream they replace. The in-filter-below-
    # aggregate discipline the checkpoint hides from the final plan is
    # pinned on the RAW frame by test_bm25_filters_before_tf_aggregate.
    dl = dl_raw.localCheckpoint(eager=False)
    stats = docs.agg(F.count(F.lit(1)).cast("double").alias("n_total")).crossJoin(
        dl.agg(F.avg(F.col("dl").cast("double")).alias("avgdl"))
    )
    tf = tf_raw.localCheckpoint(eager=False)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_total") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + k1 * ((1 - b) + b * F.col("dl") / F.col("avgdl"))
    contrib = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(idf * (F.col("tf") * (k1 + 1)) / denom * 1e6 + 0.5)
            .cast("long")
            .alias("c_micro"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(F.sum("c_micro").alias("micro"))
    w = Window.orderBy(F.col("micro").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", F.round(F.col("micro") / 1e6, 6).alias("bm25"), "rnk")
    )


_TEMP_MULT = 2971215073  # odd 32-bit (Fibonacci prime), independent of the
# other sampling multipliers


@query(
    "llm_mix_temperature",
    oracle=f"""
    WITH src AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n) AS big_n,
             SUM(CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000) AS BIGINT))
               AS denom
      FROM src
    ), rate AS (
      SELECT s.lang, s.n AS n_lang,
             (CAST(CAST(FLOOR(SQRT(CAST(s.n AS DOUBLE)) * 1000000) AS BIGINT)
                   AS DOUBLE) * CAST(t.big_n AS DOUBLE))
             / (CAST(t.denom AS DOUBLE) * CAST(s.n AS DOUBLE)) AS c
      FROM src s CROSS JOIN tot t
    ), decided AS (
      SELECT d.doc_id, d.lang, r.n_lang,
             CAST(FLOOR(r.c) AS BIGINT)
             + CASE WHEN ((d.doc_id % {_PREMOD}) * {_TEMP_MULT}) % {_MOD}
                         % 1000000
                       < CAST(FLOOR((r.c - FLOOR(r.c)) * 1000000) AS BIGINT)
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN rate r USING (lang)
    )
    SELECT doc_id, lang, n_lang,
           CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_n
    FROM decided WHERE n_copies >= 1
    """,
)
def llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the mT5/multilingual sampling rule,
    α = 0.5): target share q_i ∝ p_i^α, so small languages are up-sampled and
    large languages down-sampled while total corpus size is preserved in
    expectation. Unlike llm_source_mix's FIXED weight table, the per-language
    copy rate is COMPUTED from the corpus itself — the two-phase shape
    (O(sources) aggregate → broadcast back → row-local decision) every
    adaptive curation step uses.

    Determinism across engines: sqrt(n) snaps to an integer micro grid
    BEFORE the normalizing sum, so the denominator is an exact BIGINT (a
    float Σ over sources would be summation-order-dependent); the copy rate
    is then a fixed-order expression over integers, and the fractional part
    is decided by an independent multiplicative hash against a micro-grid
    threshold. Scale: one O(sources) aggregate, a broadcast join, zero
    additional shuffle; the up-sample is a row-local explode."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    s_micro = F.floor(F.sqrt(F.col("n").cast("double")) * 1000000).cast("long")
    tot = src.agg(
        F.sum("n").alias("big_n"), F.sum(s_micro).alias("denom")
    )
    rate = src.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n").alias("n_lang"),
        (
            (s_micro.cast("double") * F.col("big_n").cast("double"))
            / (F.col("denom").cast("double") * F.col("n").cast("double"))
        ).alias("c"),
    )
    h = _h(F.col("doc_id"), _TEMP_MULT)
    frac_thresh = F.floor((F.col("c") - F.floor(F.col("c"))) * 1000000).cast("long")
    n_copies = F.floor(F.col("c")).cast("long") + F.when(
        (h % 1000000) < frac_thresh, 1
    ).otherwise(0)
    return (
        docs.join(F.broadcast(rate), "lang")
        .select("doc_id", "lang", "n_lang", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "lang",
            "n_lang",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
            ).alias("copy_n"),
        )
    )


@query(
    "llm_sample_weighted",
    oracle="""
    WITH w AS (
      SELECT doc_id, n_chars,
             -ln(CAST(list_reduce(list_transform(range(1, 14), j ->
                  CAST(strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)),
                              CAST(j AS INTEGER), 1)) - 1 AS BIGINT)),
                  (acc, d) -> acc * 16 + d) AS DOUBLE)
                 / CAST(4503599627370496 AS DOUBLE))
             / CAST(n_chars AS DOUBLE) AS t
      FROM documents
    )
    SELECT doc_id, n_chars FROM w ORDER BY t, doc_id LIMIT 200
    """,
)
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006 via
    exponential clocks): each doc draws t = −ln(u)/w ~ Exp(w) with
    w = n_chars, and the k=200 smallest clocks are the sample — inclusion
    probability ∝ weight, the standard quality/length-weighted curation
    draw. u comes from the portable 52-bit md5 hash (see q_theta_sketch),
    so the draw is deterministic and reproducible run-to-run AND
    engine-to-engine. The physical shape is TakeOrderedAndProject:
    per-partition k-smallest heaps merge on one narrow exchange — the
    mergeable-sample property that lets 100 TB sample in one pass.

    Cross-engine note: ln() differs by ≤2 ULP between libm and the JVM
    (measured 4e-16 relative), far below the ~1e-9 adjacent-order-
    statistic gaps at these cardinalities, so the SELECTED SET (the
    output: doc_id + weight, not the clock) is stable — verified
    hash-exact at sf0.001/0.01/0.1; ties additionally broken by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    u = h.cast("double") / F.lit(4503599627370496.0)
    t = -F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select("doc_id", "n_chars", t.alias("t"))
        .orderBy("t", "doc_id")
        .limit(200)
        .select("doc_id", "n_chars")
    )


@query(
    "llm_sample_weighted_group",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             -ln(CAST(list_reduce(list_transform(range(1, 14), j ->
                  CAST(strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)),
                              CAST(j AS INTEGER), 1)) - 1 AS BIGINT)),
                  (acc, d) -> acc * 16 + d) AS DOUBLE)
                 / CAST(4503599627370496 AS DOUBLE))
             / CAST(n_chars AS DOUBLE) AS t
      FROM documents
    ), ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY t, doc_id) AS rn
      FROM w
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 50
    """,
)
def llm_sample_weighted_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP weighted sampling without replacement: an independent
    Efraimidis–Spirakis draw of k=50 docs per language, inclusion
    probability ∝ n_chars within each stratum — the per-language-quota +
    length-weighted curation draw (stratified quotas with weighted picks,
    the combination llm_sample_stratified's uniform draw can't express).
    Same deterministic hash-derived exponential clocks as
    llm_sample_weighted; per-group top-k is ONE row_number window (single
    hash-partition shuffle on lang; WindowGroupLimit prunes to k per
    group before the final filter at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    u = h.cast("double") / F.lit(4503599627370496.0)
    t = -F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("lang").orderBy(t.asc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "n_chars",
                    F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "llm_span_corruption",
    oracle="""
    WITH toks AS (
      SELECT doc_id, token, pos,
             CAST((pos - 1) // 3 AS BIGINT) AS b
      FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      )
    ), marked AS (
      SELECT doc_id, token, pos, b,
             ((b + doc_id) % 5 = 0) AS masked,
             (b - ((5 - doc_id % 5) % 5)) / 5 AS k
      FROM toks
    ), pieces AS (
      SELECT doc_id, pos, masked, b,
             CASE WHEN NOT masked THEN token
                  WHEN (pos - 1) % 3 = 0 THEN '<X_' || CAST(k AS BIGINT) || '>'
                  ELSE NULL END AS in_piece,
             CASE WHEN masked AND (pos - 1) % 3 = 0
                    THEN '<X_' || CAST(k AS BIGINT) || '> ' || token
                  WHEN masked THEN token
                  ELSE NULL END AS tgt_piece
      FROM marked
    )
    SELECT doc_id,
           string_agg(in_piece, ' ' ORDER BY pos) AS input_text,
           string_agg(tgt_piece, ' ' ORDER BY pos) AS target_text,
           COUNT(DISTINCT CASE WHEN masked THEN b END) AS n_spans
    FROM pieces
    GROUP BY doc_id
    """,
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style SPAN CORRUPTION objective construction: every document
    becomes an (input, target) pair where deterministic 3-token spans
    (~20 % of tokens: run-bucket b masked iff (b + doc_id) % 5 = 0) are
    replaced by sentinels <X_k> in the input and emitted after their
    sentinel in the target — the denoising objective a T5-family trainer
    consumes, built entirely from column expressions.

    Determinism discipline (module docstring): the mask is pure integer
    arithmetic on (position, doc_id) — no rand(), no engine hash — and the
    sentinel index k is CLOSED-FORM ((b - b0) / 5, b0 the doc's first
    masked bucket) rather than a window rank, so both engines compute it
    without ordering sensitivity.

    Scale: split→posexplode→re-agg is one doc_id-partitioned shuffle of the
    token stream, the same shape as llm_dedup_span; the re-assembly is an
    array_sort over per-doc collected pieces (bounded by doc length), so
    the operator is scan-bound at corpus scale with no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "token")
    ).select(
        "doc_id",
        "token",
        (F.col("p0") + 1).alias("pos"),
        F.floor(F.col("p0") / 3).cast("long").alias("b"),
    )
    b0 = (5 - F.col("doc_id") % 5) % 5
    marked = toks.select(
        "doc_id",
        "token",
        "pos",
        "b",
        ((F.col("b") + F.col("doc_id")) % 5 == 0).alias("masked"),
        ((F.col("b") - b0) / 5).cast("long").alias("k"),
    )
    sentinel = F.concat(F.lit("<X_"), F.col("k").cast("string"), F.lit(">"))
    run_start = (F.col("pos") - 1) % 3 == 0
    pieces = marked.select(
        "doc_id",
        "pos",
        "masked",
        "b",
        F.when(~F.col("masked"), F.col("token"))
        .when(run_start, sentinel)
        .alias("in_piece"),
        F.when(
            F.col("masked") & run_start,
            F.concat(sentinel, F.lit(" "), F.col("token")),
        )
        .when(F.col("masked"), F.col("token"))
        .alias("tgt_piece"),
    )

    def _ordered_join(col: str):
        # collect (pos, piece), sort by pos, drop nulls, join — the
        # engine-portable twin of string_agg(... ORDER BY pos)
        collected = F.array_sort(
            F.collect_list(
                F.when(
                    F.col(col).isNotNull(), F.struct("pos", F.col(col).alias("s"))
                )
            )
        )
        joined = F.array_join(F.transform(collected, lambda x: x["s"]), " ")
        # docs with NO pieces (e.g. zero masked spans): string_agg over no
        # rows is NULL in SQL; array_join over [] is '' — normalize to NULL
        return F.nullif(joined, F.lit(""))

    return pieces.groupBy("doc_id").agg(
        _ordered_join("in_piece").alias("input_text"),
        _ordered_join("tgt_piece").alias("target_text"),
        F.countDistinct(F.when(F.col("masked"), F.col("b"))).alias("n_spans"),
    )


@query(
    "llm_shard_manifest",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             (((doc_id % 2147483648) * 2654435769) % 4294967296) % 16
               AS shard_id
      FROM documents
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           CAST(SUM((doc_id * doc_id) % 1000000007) AS BIGINT)
             AS content_fingerprint
    FROM assigned
    GROUP BY shard_id
    """,
)
def llm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataloader SHARD MANIFEST: deterministically assign every document
    to one of 16 shards by Fibonacci hashing of doc_id (the module's
    multiplicative-hash discipline — engine-portable, append-stable: a
    document's shard never changes when the corpus grows) and emit the
    per-shard accounting a WebDataset-style trainer needs up front: doc
    and token totals for step budgeting plus an order-free fingerprint
    (sum of doc_id² mod p) that lets a resumed run verify it is reading
    the same shard content without rehashing the text.

    Scale: one narrow hash expression per row, one 16-group map-side
    combinable aggregate — scan-bound at any corpus size, and shard counts
    stay balanced because the golden-ratio multiplier spreads sequential
    ids uniformly."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        (
            ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435769))
            % F.lit(4294967296)
            % 16
        ).alias("shard_id"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum((F.col("doc_id") * F.col("doc_id")) % F.lit(1000000007))
        .cast("long")
        .alias("content_fingerprint"),
    )


@query(
    "llm_length_buckets",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(CASE
               WHEN len(string_split(text, ' ')) <= 16 THEN 16
               WHEN len(string_split(text, ' ')) <= 32 THEN 32
               WHEN len(string_split(text, ' ')) <= 64 THEN 64
               WHEN len(string_split(text, ' ')) <= 128 THEN 128
               ELSE 256 END AS BIGINT) AS bucket
      FROM documents
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           CAST(COUNT(*) * bucket - SUM(n_tokens) AS BIGINT) AS padding_waste,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens
    FROM sized
    GROUP BY bucket
    """,
)
def llm_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed BATCH packing accounting: documents land in
    power-of-two token buckets (16/32/64/128/256 — each batch pads to its
    bucket size), and the query reports per-bucket real vs padded token
    totals and the padding waste — the number a finetuning pipeline uses
    to choose bucket boundaries (vs llm_seq_pack's concatenate-then-chunk,
    which trades padding for cross-doc attention masking).

    Scale: one CASE expression per row + a 5-group map-side-combinable
    aggregate — scan-bound at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    bucket = (
        F.when(n_tok <= 16, 16)
        .when(n_tok <= 32, 32)
        .when(n_tok <= 64, 64)
        .when(n_tok <= 128, 128)
        .otherwise(256)
        .cast("bigint")
    )
    sized = docs.select("doc_id", n_tok.alias("n_tokens"), bucket.alias("bucket"))
    return sized.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("real_tokens"),
        (F.count(F.lit(1)) * F.col("bucket")).cast("bigint").alias("padded_tokens"),
        (F.count(F.lit(1)) * F.col("bucket") - F.sum("n_tokens"))
        .cast("bigint")
        .alias("padding_waste"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
