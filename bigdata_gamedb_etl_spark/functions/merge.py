"""Incremental-pipeline merge utilities: upsert (latest-wins) and
SCD2 history application — the batch building blocks every
incremental ETL needs on top of plain inserts.

Both are pure DataFrame ops (union + window), so they run at any scale
the underlying shuffle does; with a Delta/Iceberg table format these
become MERGE INTO, but the semantics here are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    current: DataFrame, updates: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """Latest-wins upsert: union current+updates, keep the newest row
    per key (ties broken toward the updates side).  One shuffle on the
    key columns."""
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: history rows carry
    [ts_col, end_col) validity; applying updates closes the affected
    current rows and appends the new versions as open-ended current
    rows.  `history` rows must already carry end_col/current_flag
    (seed with `scd2_init`)."""
    upd = updates.withColumn(end_col, F.lit(None).cast("timestamp")).withColumn(
        current_flag, F.lit(True)
    )
    merged = history.unionByName(upd)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    nxt = F.lead(ts_col).over(w)
    return (
        merged.withColumn(end_col, nxt)
        .withColumn(current_flag, F.col(end_col).isNull())
    )


def scd2_init(snapshot: DataFrame, end_col: str = "valid_to", current_flag: str = "is_current") -> DataFrame:
    """Seed an SCD2 history from an initial snapshot."""
    return snapshot.withColumn(end_col, F.lit(None).cast("timestamp")).withColumn(
        current_flag, F.lit(True)
    )
