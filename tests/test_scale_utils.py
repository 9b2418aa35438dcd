"""Scale utilities: bucketed co-located joins (no exchange on the join
key) and deterministic salted joins (identical results to the plain
join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_gamedb_etl_spark import plans
from bigdata_gamedb_etl_spark.functions.skew import salted_join
from bigdata_gamedb_etl_spark.sources.bucketing import bucketed_join, write_bucketed
from bigdata_gamedb_etl_spark.sources.catalog import table


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    write_bucketed(o, "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(li, "lineitem_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])

    # force the shuffle-join path (a broadcast join would bypass
    # bucketing entirely and prove nothing about the layout)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", on=["o_orderkey"])
        plan = plans.physical(joined)
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        assert "SortMergeJoin" in plan
        want = o.join(li, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    plain = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(
            li,
            sup,
            on=F.col("l_suppkey") == F.col("s_suppkey"),
            distinct_col="l_orderkey",
            n_salts=4,
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    want = {r["s_name"]: (r["n"], r["q"]) for r in plain.collect()}
    got = {r["s_name"]: (r["n"], r["q"]) for r in salted.collect()}
    assert got == want


def test_simhash_close_docs_have_close_signatures(spark, sf_dir):
    # SimHash sanity: signature is deterministic and equal docs → equal sigs
    from bigdata_gamedb_etl_spark.operators.dedup import dedup_simhash_signatures

    sigs1 = {r["doc_id"]: r["simhash"] for r in dedup_simhash_signatures(spark, sf_dir).collect()}
    sigs2 = {r["doc_id"]: r["simhash"] for r in dedup_simhash_signatures(spark, sf_dir).collect()}
    assert sigs1 == sigs2
    assert len(sigs1) > 0
    assert all(isinstance(v, int) for v in sigs1.values())


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """Runtime contract for ENGINE_CONFS' AQE skew-join handling: when
    one join key dominates a shuffle join, the executed adaptive plan
    must mark the sort-merge join skew=true (the hot partition was
    split into parallel sub-partitions) — the automatic complement to
    the explicit salting in functions/skew.py.  Thresholds are lowered
    so the local fixture (one key carrying ~all left rows) crosses the
    same factor/size checks real skew crosses at production sizes."""
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 100 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    lp, rp = str(tmp_path / "skew_l"), str(tmp_path / "skew_r")
    left.write.parquet(lp)
    right.write.parquet(rp)

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # a global aggregate: per-task partials don't care how the
        # join output is partitioned, so AQE is free to split the hot
        # partition (a groupBy on the join key would pin the join's
        # hash distribution and legitimately veto the split).  sum(v)
        # keeps the left payload column through the join — project it
        # away and the hot partition is a run of constant keys that
        # compresses below any byte threshold, hiding the skew.
        df = (
            spark.read.parquet(lp)
            .join(spark.read.parquet(rp), "k")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("sv"),
                F.sum("w").alias("sw"),
            )
        )
        # collect() (not first(): that plans a separate limited query
        # and leaves THIS df's adaptive plan unfinalized) — AQE decides
        # skew at runtime, so the plan must actually execute
        row = df.collect()[0]
        # correctness unaffected by the split: hot key 7 matches one
        # right row (198000 pairs); left multiples of 100 in right's
        # range add 500 more
        assert row["n"] == 198_500
        final_plan = plans.explain_str(df, "simple")
        assert "skew=true" in final_plan, (
            f"AQE did not split the skewed partition:\n{final_plan[:2000]}"
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
