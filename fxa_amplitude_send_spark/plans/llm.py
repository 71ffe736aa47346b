"""LLM-training-data-pipeline queries (SURVEY.md §2B) over ``documents`` and
``embeddings``.

These are first-class engine operators for the 100 TB use case: dedup,
similarity search, text analysis. SQL-expressible ones carry DuckDB oracles;
the sketch/LSH ones are rows-only (engine-specific hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_col
from ..sources import load_table
from .registry import query

STOPWORDS = ("the", "a", "of", "to", "and")


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup as a hash aggregate keeping the lowest doc_id —
    deterministic survivor choice (dropDuplicates' pick is partition-order
    dependent, so we aggregate instead). One shuffle on text hash; at 100 TB
    you'd pre-hash text to a 128-bit key and group on that instead of
    shuffling full documents — see llm_dedup_fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "text", "n_copies")


@query(
    "llm_dedup_fingerprint",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, sha256(text) AS fingerprint, COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
)
def llm_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for exact dedup: shuffle 32-byte SHA-256 fingerprints, not
    document bodies. This is the variant that survives 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.sha2(F.col("text"), 256).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "fingerprint", "n_copies")
    )


@query(
    "llm_text_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    WHERE length(token) > 0
    GROUP BY token
    """,
)
def llm_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + corpus token frequency: split/explode/aggregate — the
    map-side combine keeps the shuffle proportional to vocabulary, not corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.length("token") > 0)
    return tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "llm_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 6) AS avg_chars,
           ROUND(AVG(len(string_split(text, ' '))), 6) AS avg_tokens,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language distribution + per-doc size stats — the profiling pass every
    corpus pipeline runs first."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.size(F.split(F.col("text"), " "))), 6).alias("avg_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "llm_quality_score",
    oracle=f"""
    SELECT doc_id,
           n_tokens,
           ROUND(stop_ratio, 6) AS stop_ratio,
           ROUND(0.5 * LEAST(n_tokens, 200) / 200.0 + 0.5 * stop_ratio, 6) AS quality
    FROM (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN {STOPWORDS!r})) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    )
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length + stopword-ratio mix) as pure column
    arithmetic — the shape of a C4/Gopher-style quality filter, fully
    codegen'd, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("double") / n_tokens
    quality = 0.5 * F.least(n_tokens, F.lit(200)) / 200.0 + 0.5 * stop_ratio
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


@query(
    "llm_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def llm_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex (letter runs /
    digit runs / single punctuation) — the standard pre-tokenizer shape."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
            )
        ).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_ws_tokens"),
    )


@query(
    "llm_sim_topk",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 6)
             AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs a query vector: broadcast the query,
    JVM-side zip_with/aggregate dot product, TakeOrderedAndProject for the
    top-k. This is the exact baseline; llm_sim_ann is the sub-linear path."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    joined = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qvec))
    sim = cosine_similarity_col(F.col("embedding"), F.col("qvec"))
    return (
        joined.select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "llm_doc_events_join",
    oracle="""
    SELECT d.doc_id, d.lang,
           COUNT(e.event_id) AS n_events,
           ROUND(COALESCE(SUM(e.value), 0), 2) AS total_value
    FROM documents d LEFT JOIN events e ON d.doc_id = e.user_id
    GROUP BY d.doc_id, d.lang
    """,
)
def llm_doc_events_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal join: text corpus ↔ structured event stream on a shared id."""
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    return (
        docs.join(ev, docs["doc_id"] == ev["user_id"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("event_id").alias("n_events"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("total_value"),
        )
    )
