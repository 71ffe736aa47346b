"""AQE skew-join handling: with skew thresholds lowered, a join against a
pathologically hot key must show skew=true partitions in the FINAL adaptive
plan — the runtime complement to the explicit salting operators
(operators/skew.py): salting is the author-time fix, AQE skew-split is the
engine's automatic one, and a 100 TB deployment wants both available."""

from __future__ import annotations

import pyspark.sql.functions as F

from fxa_amplitude_send_spark.sources import load_table


def test_aqe_splits_skewed_join_partitions(spark, sf_smoke):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100b",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        ev = load_table(spark, "/root/testdata/sf0.01", "events")
        # one pathologically hot key: ~90% of rows land on key 0
        # repartition(16): skew splits subdivide a reduce partition by MAP
        # index, so the upstream stage must have >1 map task (a single
        # parquet file scans as one mapper and is indivisible)
        left = ev.select(
            F.when(F.col("event_id") % 10 < 9, 0)
            .otherwise(F.col("event_id") % 100)
            .alias("k"),
            "value",
        ).repartition(16)
        right = ev.select(
            F.when(F.col("event_id") % 10 < 9, 0)
            .otherwise(F.col("event_id") % 100)
            .alias("k"),
            F.col("event_id").alias("rid"),
        ).filter(F.col("event_id") % 7 == 0).repartition(16)
        # global agg (not groupBy(k)): a post-join aggregation on the join
        # key would reuse the join's hash partitioning, and skew-splitting
        # breaks that guarantee, so the rule would skip the join
        joined = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        joined.collect()  # action on THIS Dataset so its AQE plan finalizes
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
