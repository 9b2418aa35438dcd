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


def _files_intersecting(path, column, lo, hi):
    """Count parquet files whose [min, max] for `column` intersects
    [lo, hi] — files a stats-aware reader must open."""
    import pyarrow.parquet as pq

    total, hit = 0, 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mn = min(
            md.row_group(i).column(_col_idx(md, column)).statistics.min
            for i in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(i).column(_col_idx(md, column)).statistics.max
            for i in range(md.num_row_groups)
        )
        if mx >= lo and mn <= hi:
            hit += 1
    return hit, total


def _col_idx(md, name):
    schema = md.schema
    for i in range(len(schema)):
        if schema.column(i).name == name:
            return i
    raise KeyError(name)


def test_zorder_prunes_second_column(spark, sf_dir, tmp_path):
    """Z-order's whole point: files become selective on BOTH columns.
    A layout sorted only by user_id leaves `cents` spanning the full
    range in every file; the z-ordered layout must let a cents
    predicate skip some files."""
    from bigdata_gamedb_etl_spark.sources.layout import write_zordered

    e = (
        table(spark, sf_dir, "events")
        .select("user_id", (F.col("value") * 100).cast("long").alias("cents"))
    )
    single = str(tmp_path / "by_user")
    (
        e.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.option("maxRecordsPerFile", 800)
        .parquet(single)
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(e, zpath, "user_id", "cents", max_records_per_file=800)

    # same rows in both layouts
    assert spark.read.parquet(zpath).count() == e.count()

    lo, hi = 100, 700  # narrow cents band
    hit_single, total_single = _files_intersecting(single, "cents", lo, hi)
    hit_z, total_z = _files_intersecting(zpath, "cents", lo, hi)
    assert total_z > 1
    # user_id-sorted layout cannot skip anything for a cents predicate
    assert hit_single == total_single
    # z-ordered layout must skip at least one file
    assert hit_z < total_z


def test_compact_rewrites_to_target_file_count(spark, sf_dir, tmp_path):
    from bigdata_gamedb_etl_spark.sources.layout import compact

    path = str(tmp_path / "fragmented")
    table(spark, sf_dir, "events").repartition(40).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before == 40
    rows = spark.read.parquet(path).count()

    compact(spark, path, target_files=4)
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_after == 4
    assert spark.read.parquet(path).count() == rows


def test_bloom_filter_write_embeds_filter_and_round_trips(spark, sf_dir, tmp_path):
    """write_with_bloom must actually embed the filter (pyarrow 16 can't
    read bloom metadata, so the evidence is the file-size delta of the
    identical single-file dataset — split-block blooms are kilobytes,
    never zero) and point lookups on the bloom column must stay exact."""
    from bigdata_gamedb_etl_spark.sources.layout import write_with_bloom

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .coalesce(1)
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    ev.write.parquet(plain)
    write_with_bloom(ev, bloomed, ["user_id"], expected_ndv=20_000)

    def one_file_size(p):
        (f,) = [x for x in os.listdir(p) if x.endswith(".parquet")]
        return os.path.getsize(os.path.join(p, f))

    assert one_file_size(bloomed) > one_file_size(plain)

    probe = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .orderBy("count")
        .first()["user_id"]
    )
    expect = ev.where(F.col("user_id") == probe).count()
    got = spark.read.parquet(bloomed).where(F.col("user_id") == probe).count()
    assert got == expect > 0


def test_compact_tolerates_leftover_old_dir(spark, sf_dir, tmp_path):
    """A crash between compact()'s rename-aside and cleanup leaves a
    `__old` directory; the next compact must clear it and still swap
    correctly (and never leave the live path missing)."""
    from bigdata_gamedb_etl_spark.sources.layout import compact

    path = str(tmp_path / "ds")
    table(spark, sf_dir, "nation").repartition(8).write.parquet(path)
    rows = spark.read.parquet(path).count()
    os.makedirs(path + "__old/junk")  # simulated prior-crash leftover

    compact(spark, path, target_files=2)
    assert spark.read.parquet(path).count() == rows
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__compacting")
