"""Python user-defined table functions (Spark 4 UDTF API).

UDTFs are the row→rows extension surface: a Python class whose eval()
yields any number of output rows per input row, usable from SQL as a
table function (including LATERAL joins). They complement the engine's
three UDF surfaces (scalar pandas_udf, applyInPandas, mapInPandas —
SURVEY.md §2B) with the table-valued shape.

They are also the SLOW path — per-row Python without Arrow batching — so
every UDTF here has a codegen'd production twin and exists to prove the
API surface and cross-check semantics: chunk_documents_udtf mirrors
llm_doc_chunk (explode-of-sequence, plans/llm.py) exactly, and the
registered llm_doc_chunk_udtf query is hash-checked against the SAME
DuckDB oracle — two independent implementations, one contract.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id bigint, chunk_text string, n_chunk_tokens bigint")
class ChunkDocUDTF:
    """50-token chunks with stride 40 over a whitespace tokenization —
    llm_doc_chunk's contract (chunk_id = start//40, last chunk ragged).

    Executor-pickling discipline: eval() uses only builtins.
    """

    def eval(self, text: str):  # noqa: D102 — contract documented above
        toks = (text or "").split(" ")
        n = max(len(toks), 1)
        for start in range(0, n, 40):
            chunk = toks[start : start + 50]
            yield (start // 40, " ".join(chunk), len(chunk))


def chunk_documents_udtf(spark, docs):
    """LATERAL-join the UDTF against the documents relation: one input row
    fans out to its chunk rows, keyed by doc_id."""
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_chunk_tokens
        FROM _udtf_docs d, LATERAL chunk_doc(d.text) c
        """
    )
