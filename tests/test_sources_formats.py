"""Source-format adapter contract: explicit-schema requirement, unknown
format rejection, and exact row-level round-trip fidelity per format
(the registered q_source_* queries prove the aggregate path under the
driver gate; these prove raw rows)."""

from __future__ import annotations

import pytest

from fxa_amplitude_send_spark.sources import load_table, read_as, stage_roundtrip

SF = "/root/testdata/sf0.001"


def test_read_as_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unknown format"):
        read_as(spark, "/tmp/nope", "avro")


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_formats_require_schema(spark, fmt):
    with pytest.raises(ValueError, match="explicit schema"):
        read_as(spark, "/tmp/nope", fmt)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip_rows_exact(spark, fmt):
    src = load_table(spark, SF, "customer")
    back = stage_roundtrip(spark, SF, "customer", fmt)
    assert back.schema == src.schema
    cols = sorted(src.columns)
    a = {tuple(r) for r in src.select(*cols).collect()}
    b = {tuple(r) for r in back.select(*cols).collect()}
    assert a == b


def test_schema_evolution_merge(spark, tmp_path):
    """Schema-on-read evolution: two writer generations (v2 adds a column),
    one mergeSchema scan — old files yield NULL for the new column, and
    the unified schema is the union. This is how a 100 TB table absorbs
    schema change without rewriting history."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.parquet(base + "/gen=1")
    spark.range(5, 10).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("new").alias("tag")
    ).write.parquet(base + "/gen=2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "v", "tag", "gen"}
    assert df.count() == 10
    old_rows = df.filter(F.col("gen") == 1)
    assert old_rows.filter(F.col("tag").isNull()).count() == 5


def test_batch_observation_metrics_without_extra_scan(spark, sf_smoke):
    """The Observation API collects aggregate metrics as a side effect of
    the action already running — no second scan (the reference logs batch
    metrics the same way: counters accumulated on the single pass,
    synchronous-pull.js:94-101)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from fxa_amplitude_send_spark.sources import load_table

    ev = load_table(spark, sf_smoke, "events")
    obs = Observation("batch_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    n = observed.filter(F.col("value") > 0).count()  # the one action
    m = obs.get
    assert m["n_rows"] >= n and m["n_rows"] == ev.count()
    assert m["min_value"] <= m["max_value"]


def test_badrecords_modes_on_same_feed(spark, tmp_path):
    """The three malformed-record policies on one feed: PERMISSIVE
    quarantines (covered by q_source_json_badrecords's oracle),
    DROPMALFORMED silently keeps only parseable rows, FAILFAST raises —
    the policy triad every ingestion contract needs pinned."""
    import json

    import pytest

    feed = tmp_path / "feed.jsonl"
    good = [{"event_id": i, "event_type": "t", "value": 1.0} for i in range(5)]
    with open(feed, "w") as fh:
        for g in good:
            fh.write(json.dumps(g) + "\n")
        fh.write('{"event_id": 99, "event_type"\n')  # corrupt
        fh.write("garbage\n")                         # corrupt
    schema = "event_id long, event_type string, value double"

    dropped = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(str(feed))
    )
    assert dropped.count() == 5

    with pytest.raises(Exception) as exc:
        (
            spark.read.schema(schema)
            .option("mode", "FAILFAST")
            .json(str(feed))
            .count()
        )
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_table_row_count_footer_stats_and_loud_failure(tmp_path):
    """table_row_count reads parquet FOOTER stats (zero Spark jobs) for a
    file or a flat part directory, and FAILS LOUDLY on layout drift — a
    silent 0 would pass every downstream gate in the wrong direction
    (0 rows qualifies any table for broadcast; bloom_bits_for(0) floors
    the bitmap), so no-footers-found must raise, not sum an empty glob."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fxa_amplitude_send_spark.sources.tables import table_row_count

    assert table_row_count(SF, "nation") == 25

    part_dir = tmp_path / "t.parquet"
    part_dir.mkdir()
    pq.write_table(pa.table({"a": [1, 2, 3]}), part_dir / "part-0.parquet")
    pq.write_table(pa.table({"a": [4]}), part_dir / "part-1.parquet")
    assert table_row_count(str(tmp_path), "t") == 4

    (tmp_path / "drifted.parquet").mkdir()  # empty dir: no footers anywhere
    with pytest.raises(FileNotFoundError, match="no parquet footers"):
        table_row_count(str(tmp_path), "drifted")
    with pytest.raises(FileNotFoundError):
        table_row_count(str(tmp_path), "never_written")
