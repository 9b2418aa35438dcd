"""Physical data layout for scan pruning: hive-partitioned, sorted,
size-bounded parquet.

At 100 TB, query cost is dominated by what the scan can SKIP:
  - directory partitioning on a low-cardinality filter column turns
    `WHERE lang = 'en'` into partition pruning (files never opened);
  - sortWithinPartitions on a range-filtered column tightens parquet
    row-group min/max stats so the reader skips row groups;
  - maxRecordsPerFile bounds file size, keeping task granularity even
    and avoiding the giant-file straggler.

The reference's single flat CSV (BigData-GameDB-ETL data layout) has
none of these levers; this module is what its workload would need on a
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet, sorted within partitions so
    row-group stats are selective on sort_cols."""
    if sort_cols:
        # repartition on the partition columns first so each output
        # partition directory is written by few tasks (fewer, larger,
        # fully-sorted files instead of one sorted sliver per task)
        df = df.repartition(*partition_cols).sortWithinPartitions(*sort_cols)
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned dataset; filters on partition columns
    prune directories (visible as PartitionFilters in the scan plan)."""
    return spark.read.parquet(path)
