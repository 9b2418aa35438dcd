"""Mergeable sketch aggregates — the approximate-distinct machinery a
100 TB pipeline uses instead of exact COUNT(DISTINCT) re-shuffles.

Two shapes, both rows-only checked (sketch estimates are
implementation-defined; DuckDB's approx_count_distinct uses a
different HLL construction, so a value-hash oracle is impossible by
design).  Accuracy is asserted against exact distinct counts with the
sketch's error bound in tests/test_llm_pipeline.py.

Why sketches and not approx_count_distinct: the Datasketches HLL
column (`hll_sketch_agg`) is a MERGEABLE binary — partials built per
partition / per day / per source can be stored, shipped, and
`hll_union_agg`-ed later without touching raw data again.  That
two-level shape (sketch once, merge many) is the hypertable /
incremental-rollup pattern; a plain approx_count_distinct forces a
full rescan per question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table

HLL_LGK = 14  # 2^14 buckets → ~1% relative standard error


def sketch_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type from an HLL sketch
    column (one pass, partials combine map-side like any aggregate)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("approx_users"),
            F.count("*").alias("event_count"),
        )
        .orderBy("event_type")
    )


def sketch_daily_merge_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sketch merge: per-day HLL partials (what an
    incremental pipeline would persist alongside each day's partition),
    then hll_union_agg merges them into the whole-corpus distinct-user
    estimate WITHOUT rescanning events.  The merged estimate must agree
    with a direct one-pass sketch — asserted in tests."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("DAY", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("day_sketch")
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias(
            "approx_total_users"
        ),
        F.count("*").alias("days_merged"),
    )


QUERIES = {
    "sketch_users_per_type": sketch_users_per_type,
    "sketch_daily_merge_total": sketch_daily_merge_total,
}

ORACLE: dict[str, str] = {
    # both rows-only: Datasketches HLL estimates are not reproducible in
    # DuckDB's HLL; accuracy asserted vs exact counts in tests instead.
}
