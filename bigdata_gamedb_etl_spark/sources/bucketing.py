"""Bucketed table layout — the shuffle-free co-located join path.

At 100 TB the dominant cost of fact⋈fact joins is shuffling both
sides.  Writing both tables bucketed (and optionally sorted) on the
join key lets Spark plan the join with zero exchanges: each bucket
pair joins locally.  This is the storage-layout lever the reference
never had (single flat CSV).
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed managed table (parquet).  Both sides of a
    co-located join must use the same bucket count and keys."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale location survives an unregistered table (e.g. crashed run)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two pre-bucketed tables; with matching bucketing Spark
    plans this without any Exchange on the join keys."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
