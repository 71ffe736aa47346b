"""Storage-layout writers: partitioned and bucketed parquet.

At 100 TB the table layout IS the query plan: directory partitioning turns
predicates into pruned file listings (zero IO for excluded partitions), and
bucketing pre-shuffles both sides of a recurring join key so the join runs
shuffle-free forever after. These helpers wrap the two patterns with the
knobs that matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style directory partitioning. Choose partition columns with
    bounded cardinality (date, lang, tenant) — one directory per value; high
    cardinality here is the classic small-files failure mode."""
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed (pre-shuffled) table in the session catalog: joins and
    aggregations on ``bucket_col`` between tables bucketed the same way run
    WITHOUT an exchange — the one-time write cost buys every future query's
    shuffle. n_buckets should divide evenly into the cluster's parallelism."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def read_partition_pruned(
    spark: SparkSession, path: str, partition_col: str, value
) -> DataFrame:
    """Scan exactly one partition — the filter binds at file-listing time
    (PartitionFilters in explain), not at row time."""
    from pyspark.sql import functions as F

    return spark.read.parquet(path).filter(F.col(partition_col) == value)
