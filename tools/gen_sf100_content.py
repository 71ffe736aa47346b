"""Real sf100 documents/embeddings (round-9 verdict item 2): replace the
sf10 stand-in SYMLINKS gen_sf100.py leaves for the content tables with true
10x replicas, using exactly gen_scale.py's perturbation model —

- documents: replicas > 0 get a replica token spliced every 8 words, so
  cross-replica shingle Jaccard collapses and the near-dup CLUSTER
  STRUCTURE replicates (10x more clusters of the same size) instead of
  inflating (which would make LSH buckets / connected components
  superlinear for reasons unrelated to the operators);
- embeddings: replicas > 0 get deterministic Gaussian noise
  (seed = 42 + replica), keeping ANN bucket occupancy linear in sf.

Unlike gen_scale's in-memory builders this streams ONE REPLICA PER ROW
GROUP through a ParquetWriter, so peak memory stays O(sf10) while writing
the 5M-doc / 2M-vector sf100 tables.

Usage: python tools/gen_sf100_content.py [src_sf10] [dst_sf100]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gen_scale import SEED, _domain

FACTOR = 10


def _replace_symlink(path: str) -> None:
    if os.path.islink(path):
        os.unlink(path)


def documents(con, src: str, dst: str) -> int:
    stride = _domain(con, src, "documents", "doc_id")
    base = con.sql(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{src}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    out_path = os.path.join(dst, "documents.parquet")
    _replace_symlink(out_path)
    total = 0
    with pq.ParquetWriter(out_path, schema) as w:
        for i in range(FACTOR):
            ids, texts, langs, sources, n_chars = [], [], [], [], []
            for doc_id, text, lang, source in base:
                if i > 0:
                    words = text.split(" ")
                    spliced = []
                    for j, word in enumerate(words):
                        if j % 8 == 0:
                            spliced.append(f"rep{i}tok")
                        spliced.append(word)
                    text = " ".join(spliced)
                ids.append(doc_id + i * stride)
                texts.append(text)
                langs.append(lang)
                sources.append(source)
                n_chars.append(len(text))
            w.write_table(
                pa.table(
                    {"doc_id": ids, "text": texts, "lang": langs,
                     "source": sources, "n_chars": n_chars},
                    schema=schema,
                )
            )
            total += len(ids)
    return total


def embeddings(con, src: str, dst: str) -> int:
    stride = _domain(con, src, "embeddings", "vec_id")
    tbl = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vec_ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_numpy()
    emb_col = tbl["embedding"].combine_chunks()
    flat = emb_col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(vec_ids)
    dim = flat.size // n
    X = flat.reshape(n, dim)
    # gen_scale._embeddings iterates vectors in vec_id order
    order = np.argsort(vec_ids)
    vec_ids, labels, X = vec_ids[order], labels[order], X[order]
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    out_path = os.path.join(dst, "embeddings.parquet")
    _replace_symlink(out_path)
    offsets = np.arange(0, (n + 1) * dim, dim, dtype=np.int64)
    total = 0
    with pq.ParquetWriter(out_path, schema) as w:
        for i in range(FACTOR):
            rng = np.random.default_rng(SEED + i)
            noise = (
                rng.normal(0.0, 0.02, size=(n, dim)).astype(np.float32)
                if i > 0
                else np.zeros((n, dim), dtype=np.float32)
            )
            vals = pa.array((X + noise).reshape(-1), type=pa.float32())
            emb = pa.ListArray.from_arrays(pa.array(offsets), vals)
            w.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(vec_ids + i * stride, type=pa.int64()),
                        "embedding": emb,
                        "label": pa.array(labels, type=pa.int32()),
                    },
                    schema=schema,
                )
            )
            total += n
    return total


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "testdata", "sf10")
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "testdata", "sf100")
    con = duckdb.connect()
    n_doc = documents(con, src, dst)
    print(f"documents: {n_doc}")
    n_vec = embeddings(con, src, dst)
    print(f"embeddings: {n_vec}")
    readme = os.path.join(dst, "README.txt")
    with open(readme, "w", encoding="utf-8") as fh:
        fh.write(
            "sf100 instance: TPC-H tables are true 10x replicas of sf10 "
            "(gen_sf100.py); documents/embeddings are true 10x replicas of "
            "sf10 (gen_sf100_content.py, gen_scale perturbation model); "
            "events remains an sf10 STAND-IN symlink (no sf100 query reads "
            "it).\n"
        )


if __name__ == "__main__":
    main()
