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

import os

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


def zvalue(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative int columns
    (each clamped to `bits` bits): sorting by the z-value clusters BOTH
    dimensions, so min/max file stats prune filters on either column —
    a single-column sort only prunes its own column.

    Pure bitwise column expression (JVM-side, codegen'd): bit i of x
    lands at 2i, bit i of y at 2i+1."""
    from pyspark.sql import functions as F

    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    mask = (1 << bits) - 1
    xs, ys = x.cast("long").bitwiseAND(F.lit(mask)), y.cast("long").bitwiseAND(
        F.lit(mask)
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    max_records_per_file: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet globally sorted by the z-value of (col_x, col_y):
    file-level min/max stats become selective on BOTH columns."""
    (
        df.withColumn("__z", zvalue(col_x, col_y))
        .repartitionByRange(8, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    expected_ndv: int,
    mode: str = "overwrite",
) -> None:
    """Write a point-lookup-indexed parquet dataset: `key_cols` plus
    whatever other columns `df` carries, with split-block bloom filters
    embedded per row group.

    Min/max row-group stats prune RANGE predicates but are useless for
    point lookups on high-cardinality unsorted columns (every row group
    spans most of the value space).  A bloom filter answers "is this
    key definitely absent from this row group?" — at 100 TB it turns
    needle-in-haystack `WHERE id = x` scans from full-table reads into
    a handful of row groups; parquet-mr consults the filter
    automatically on read.

    Caveat (verified on Spark 4.1 / parquet-java 1.16): the documented
    per-column `parquet.bloom.filter.enabled#col` writer options are
    silently dropped by the DataFrame write path — only the GLOBAL
    options reach the writer, so every column of `df` gets a filter.
    The function therefore asserts `key_cols` are present and leaves
    column selection to the caller: project the lookup keys (+ payload)
    before writing, exactly what a lookup-side index dataset wants
    anyway.  `expected_ndv` sizes the filter per row group."""
    missing = set(key_cols) - set(df.columns)
    if missing:
        raise ValueError(f"bloom key columns not in DataFrame: {sorted(missing)}")
    (
        df.write.mode(mode)
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", str(expected_ndv))
        .parquet(path)
    )


def compact(spark: SparkSession, path: str, target_files: int) -> None:
    """Compact a small-file parquet dataset in place: read, coalesce to
    `target_files`, rewrite through a staging directory, swap via
    rename.  The live data is renamed aside BEFORE the staging move and
    deleted only after the swap, so a failure at any single step leaves
    either the old or the new dataset intact — never neither.  (True
    atomicity needs a table format — Delta/Iceberg — on object stores
    without atomic rename; this is the plain-directory best effort.)

    REQUIRES EXCLUSIVE ACCESS: between the rename-aside and the staging
    move there is a window where `path` does not exist, so a concurrent
    reader can fail with path-not-found even though no data was lost;
    run compaction only when no readers are active (or behind a table
    format that versions snapshots).  Crash recovery: if the process
    dies inside the window, the complete previous dataset is at
    `<path>__old` — restore it with a single directory rename; a
    finished-but-unswapped rewrite may also be at `<path>__compacting`
    (safe to delete, it is rebuilt from the source on retry).

    The small-file problem is the classic slow-creep scale bug: a
    streaming or per-batch writer leaves thousands of KB-size files and
    scan task-scheduling overhead swamps I/O."""
    import shutil

    base = path.rstrip("/")
    staging = base + "__compacting"
    old = base + "__old"
    spark.read.parquet(path).coalesce(target_files).write.mode("overwrite").parquet(
        staging
    )
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    os.rename(base, old)
    try:
        shutil.move(staging, base)
    except BaseException:
        os.rename(old, base)  # roll back: old data is still complete
        raise
    shutil.rmtree(old)
