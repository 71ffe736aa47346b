"""Salting helpers must be result-identical to the direct formulation."""

from __future__ import annotations

import pyspark.sql.functions as F

from fxa_amplitude_send_spark.operators.skew import salted_aggregate, salted_join
from fxa_amplitude_send_spark.sources import load_table


def test_salted_aggregate_matches_plain(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("min_p"),
            F.max("l_extendedprice").alias("max_p"),
        )
    )
    salted = salted_aggregate(
        li.select("l_returnflag", "l_quantity", "l_extendedprice"),
        key_cols=["l_returnflag"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "min_p": ("l_extendedprice", "min"),
            "max_p": ("l_extendedprice", "max"),
        },
        salt_buckets=8,
    )
    p = {r["l_returnflag"]: r for r in plain.collect()}
    s = {r["l_returnflag"]: r for r in salted.collect()}
    assert p.keys() == s.keys()
    for k in p:
        assert s[k]["n"] == p[k]["n"]
        assert abs(s[k]["sum_qty"] - p[k]["sum_qty"]) < 1e-6
        assert s[k]["min_p"] == p[k]["min_p"]
        assert s[k]["max_p"] == p[k]["max_p"]


def test_salted_join_matches_plain(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select("o_custkey", "o_orderkey")
    customer = load_table(spark, sf_smoke, "customer").select("c_custkey", "c_name")
    plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders,
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey",
        salt_buckets=4,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
