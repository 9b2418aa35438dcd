"""Physical-layout contract: partition pruning and row-group stats
must actually engage on the written layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_gamedb_etl_spark import plans
from bigdata_gamedb_etl_spark.sources.catalog import table
from bigdata_gamedb_etl_spark.sources.layout import (
    read_pruned,
    write_partitioned_sorted,
)


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    write_partitioned_sorted(
        table(spark, sf_dir, "documents"),
        out,
        partition_cols=["lang"],
        sort_cols=["n_chars"],
    )
    # hive layout on disk: one directory per language
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(dirs) >= 2

    filtered = read_pruned(spark, out).where(F.col("lang") == "en")
    plan = plans.physical(filtered)
    # the filter must land in PartitionFilters (directory pruning),
    # not in PushedFilters (row-group skipping inside opened files)
    assert "PartitionFilters" in plan
    pf = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert "lang" in pf

    # pruned read returns exactly the partition's rows
    want = table(spark, sf_dir, "documents").where(F.col("lang") == "en").count()
    assert filtered.count() == want


def test_sorted_layout_round_trips_all_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_sorted")
    write_partitioned_sorted(
        table(spark, sf_dir, "documents"),
        out,
        partition_cols=["lang"],
        sort_cols=["n_chars"],
        max_records_per_file=200,
    )
    got = read_pruned(spark, out)
    assert got.count() == table(spark, sf_dir, "documents").count()
    # range predicate on the sort column is pushed to the parquet reader
    plan = plans.physical(got.where(F.col("n_chars") > 300))
    pushed = plan[plan.index("PushedFilters") :].splitlines()[0]
    assert "n_chars" in pushed
