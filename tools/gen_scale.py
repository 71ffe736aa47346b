"""Scale up the driver-generated testdata by an integer factor (default:
sf0.1 x10 -> sf1) for scale-slope studies.

The driver's generator is not available, so this reproduces the TPC-H
scaling MODEL from an existing SF instead: every scaling table is
replicated ``factor`` times with per-replica key offsets equal to the
observed key-domain size, which

- preserves referential integrity exactly (each replica is a closed world:
  orders reference their replica's customers, lineitems their replica's
  orders/parts/suppliers),
- preserves every per-key distribution (basket sizes, orders per customer,
  value/date distributions) — the same property TPC-H's own sf scaling has
  (more keys, same per-key shape), so per-query runtime slopes measured on
  this data reflect the documented complexity of each operator,
- keeps the fixed tables (region, nation) fixed, like TPC-H.

Content tables get a deterministic per-replica perturbation so that
similarity workloads stay realistic rather than pathological:

- documents: replicas > 0 get a replica token spliced in every 8 words.
  Any 5-gram shingle window near a spliced token changes, pushing
  cross-replica Jaccard far below near-dup thresholds — so the dup/near-dup
  CLUSTER STRUCTURE of the base corpus is replicated (10x more clusters of
  the same size), not inflated (same clusters 10x bigger, which would make
  LSH bucket sizes and connected components superlinear in sf for reasons
  that have nothing to do with the operators). n_chars is recomputed to
  keep the n_chars == len(text) invariant.
- embeddings: replicas > 0 get small deterministic Gaussian noise
  (seed = 42 + replica), so vectors are near but not equal — no exact-tie
  top-k pathology, ANN bucket occupancy scales linearly.

Usage: python tools/gen_scale.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 <repo>/testdata/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: per-table (key column -> offset stride) at the SOURCE sf; strides are the
#: observed 0-based contiguous key-domain sizes, verified at generation time.
SEED = 42


def _copy(con, src, dst, table):
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
        f"TO '{dst}/{table}.parquet' (FORMAT parquet)"
    )


def _domain(con, src, table, col) -> int:
    lo, hi = con.sql(
        f"SELECT min({col}), max({col}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()
    if lo != 0:
        raise AssertionError(f"{table}.{col}: expected 0-based keys, min={lo}")
    return int(hi) + 1


def _replicate(con, src, dst, table, factor, offsets, renames=None):
    """offsets: {col: stride}; renames: {col: sql_expr using the offset col
    and the replica index ``r.i``}.

    Streams ONE REPLICA PER PASS through a ParquetWriter.  (The original
    single-statement ``COPY (... CROSS JOIN range(factor) ORDER BY r.i)``
    materialized the ENTIRE output for the sort — ~100 GB for sf100
    lineitem — and an in-memory duckdb connection has no temp spill path,
    so generation stalled at the memory limit on a busy box, round 9.
    The per-replica loop produces the same rows in the same replica-major
    order with O(one row-group) peak memory.)"""
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
        ).fetchall()
    ]
    out = os.path.join(dst, f"{table}.parquet")
    tmp = out + ".tmp"
    writer = None
    try:
        for i in range(factor):
            # the replica index as a BIGINT literal, matching the type of
            # the old generator's range()-sourced r.i so key columns keep
            # the same parquet physical type across generator versions
            ri = f"CAST({i} AS BIGINT)"
            exprs = []
            for c in cols:
                if c in offsets:
                    exprs.append(f"{c} + {ri} * {offsets[c]} AS {c}")
                elif renames and c in renames:
                    exprs.append(f"({renames[c].replace('r.i', ri)}) AS {c}")
                else:
                    exprs.append(c)
            rel = con.sql(
                f"SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{src}/{table}.parquet')"
            )
            reader = rel.fetch_arrow_reader(1 << 20)
            for batch in reader:
                tbl = pa.Table.from_batches([batch])
                if writer is None:
                    writer = pq.ParquetWriter(tmp, tbl.schema)
                writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, out)


def _documents(con, src, dst, factor, stride):
    base = con.sql(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{src}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(factor):
        for doc_id, text, lang, source in base:
            if i > 0:
                words = text.split(" ")
                spliced = []
                for j, w in enumerate(words):
                    if j % 8 == 0:
                        spliced.append(f"rep{i}tok")
                    spliced.append(w)
                text = " ".join(spliced)
            out["doc_id"].append(doc_id + i * stride)
            out["text"].append(text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(text))
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.table(out, schema=schema), f"{dst}/documents.parquet")


def _embeddings(con, src, dst, factor, stride):
    base = con.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{src}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vec_ids, embs, labels = [], [], []
    dim = len(base[0][1])
    for i in range(factor):
        rng = np.random.default_rng(SEED + i)
        noise = (
            rng.normal(0.0, 0.02, size=(len(base), dim)).astype(np.float32)
            if i > 0
            else np.zeros((len(base), dim), dtype=np.float32)
        )
        for k, (vec_id, emb, label) in enumerate(base):
            vec_ids.append(vec_id + i * stride)
            embs.append((np.asarray(emb, dtype=np.float32) + noise[k]).tolist())
            labels.append(label)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.table({"vec_id": vec_ids, "embedding": embs, "label": labels}, schema=schema),
        f"{dst}/embeddings.parquet",
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "testdata", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    n_cust = _domain(con, src, "customer", "c_custkey")
    n_ord = _domain(con, src, "orders", "o_orderkey")
    n_part = _domain(con, src, "part", "p_partkey")
    n_supp = _domain(con, src, "supplier", "s_suppkey")
    n_event = _domain(con, src, "events", "event_id")
    n_user = int(
        con.sql(
            f"SELECT max(user_id) FROM read_parquet('{src}/events.parquet')"
        ).fetchone()[0]
    ) + 1
    n_doc = _domain(con, src, "documents", "doc_id")
    n_vec = _domain(con, src, "embeddings", "vec_id")

    _copy(con, src, dst, "region")
    _copy(con, src, dst, "nation")
    _replicate(
        con, src, dst, "customer", factor,
        {"c_custkey": n_cust},
        renames={"c_name": f"printf('Customer#%09d', c_custkey + r.i * {n_cust})"},
    )
    _replicate(con, src, dst, "supplier", factor, {"s_suppkey": n_supp},
               renames={"s_name": f"printf('Supplier#%09d', s_suppkey + r.i * {n_supp})"})
    _replicate(con, src, dst, "part", factor, {"p_partkey": n_part})
    _replicate(con, src, dst, "orders", factor,
               {"o_orderkey": n_ord, "o_custkey": n_cust})
    _replicate(con, src, dst, "lineitem", factor,
               {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp})
    _replicate(con, src, dst, "events", factor,
               {"event_id": n_event, "user_id": n_user})
    _documents(con, src, dst, factor, n_doc)
    _embeddings(con, src, dst, factor, n_vec)

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
