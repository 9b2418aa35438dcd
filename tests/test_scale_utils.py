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
