"""sf100 for the money set: TPC-H tables replicated 10x from sf10 (same
closed-world key-offset model as gen_scale.py); events/documents/embeddings
are sf10 STAND-INS (symlinks) — the sf100 study only runs TPC-H money
queries, and 10x-ing the content tables would cost disk and hours for
queries that never read them. README.txt records the stand-in so nobody
mistakes the directory for a full sf100.

Usage: python tools/gen_sf100.py [src_sf10] [dst_sf100]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb

from gen_scale import _copy, _domain, _replicate


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "testdata", "sf10")
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "testdata", "sf100")
    factor = 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    n_cust = _domain(con, src, "customer", "c_custkey")
    n_ord = _domain(con, src, "orders", "o_orderkey")
    n_part = _domain(con, src, "part", "p_partkey")
    n_supp = _domain(con, src, "supplier", "s_suppkey")

    _copy(con, src, dst, "region")
    _copy(con, src, dst, "nation")
    _replicate(
        con, src, dst, "customer", factor,
        {"c_custkey": n_cust},
        renames={"c_name": f"printf('Customer#%09d', c_custkey + r.i * {n_cust})"},
    )
    _replicate(
        con, src, dst, "supplier", factor,
        {"s_suppkey": n_supp},
        renames={"s_name": f"printf('Supplier#%09d', s_suppkey + r.i * {n_supp})"},
    )
    _replicate(con, src, dst, "part", factor, {"p_partkey": n_part})
    _replicate(con, src, dst, "orders", factor,
               {"o_orderkey": n_ord, "o_custkey": n_cust})
    _replicate(con, src, dst, "lineitem", factor,
               {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp})
    for t in ["events", "documents", "embeddings"]:
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(os.path.abspath(src), f"{t}.parquet"), link)
    with open(os.path.join(dst, "README.txt"), "w", encoding="utf-8") as fh:
        fh.write(
            "sf100 money-set instance: TPC-H tables are true 10x replicas of "
            "sf10; events/documents/embeddings are sf10 STAND-IN symlinks "
            "(the sf100 study only runs TPC-H queries).\n"
        )
    for t in ["customer", "supplier", "part", "orders", "lineitem"]:
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
