"""Flagship analytical queries (TPC-H-shaped) over the star schema.

The reference's workload is aggregate-scan-sort over one flat table
(SURVEY.md §2.4); the engine's flagship re-expresses that capability on
the driver's star schema at TPC-H shape.  Q1 is the headline: pure
scan → partial/final hash aggregate → tiny sort, the plan profile that
dominates a 100 TB batch workload.

Scale notes:
- Q1 filter is pushed into the Parquet scan (PushedFilters on
  l_shipdate), grouping cardinality is tiny (R/F × O/F) so the shuffle
  after partial aggregation moves a handful of rows per partition.
- Q3 joins orders→lineitem on the join key both sides shuffle on; the
  customer side carries NO broadcast hint — customer scales with SF, so
  AQE picks broadcast when it fits and shuffle join when it doesn't.
  Explicit hints are reserved for the fixed-cardinality dimensions
  (DIMENSION_TABLES in sources/catalog.py: region, nation); supplier
  and part scale ×SF and are AQE-decided too (r8 sweep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table
from ._rounding import _avg_q

SHIP_CUTOFF = "2000-09-02"
Q3_DATE = "1998-01-01"

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))




def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (capability: multi-aggregate groupBy —
    reference: spark_eda.py:78-83,105-111 pattern, widened)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum((_rev() * (1 + F.col("l_tax"))).cast("decimal(18,6)")), 2
            ).cast("double").alias("sum_charge"),
            # averages go through exact order-free sums + the floor
            # recipe (r8 round-on-average sweep); these three columns
            # are certified fixed-point, so the quantized-BIGINT form
            # replaces the 2×-slower DECIMAL sum (see _rounding._avg_q)
            _avg_q(F.col("l_quantity"), 2).alias("avg_qty"),
            _avg_q(F.col("l_extendedprice"), 2).alias("avg_price"),
            _avg_q(F.col("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
  floor(SUM(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0
        / COUNT(l_quantity) * 100.0 + 0.5) / 100.0 AS avg_qty,
  floor(SUM(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0
        / COUNT(l_extendedprice) * 100.0 + 0.5) / 100.0 AS avg_price,
  floor(SUM(CAST(round(l_discount * 10000.0) AS BIGINT)) / 10000.0
        / COUNT(l_discount) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped-revenue orders (join + agg + top-k; Spark plans
    the final orderBy+limit as TakeOrderedAndProject — SURVEY.md §2.5 O4)."""
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # no broadcast hint on customer: it scales with the fact side
        # (×SF), so the join strategy is AQE's call — a hint would
        # override AQE's size check and OOM the build side at 100×.
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation where supplier and customer share the
    nation (the co-location predicate joins two dimension paths of the
    same fact row).  Nation hint-broadcasts; every SF-proportional
    side (customer, supplier) is AQE-decided; lineitem⋈orders is the
    only big shuffle."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer AND supplier scale ×SF — AQE decides (see q3 note);
        # only nation (25 rows) is safe to hint.
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("revenue"),
            F.count("*").alias("item_count"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_ORACLE = f"""
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS item_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure filter + global aggregate — the canonical
    pushdown benchmark (every predicate reaches the parquet scan)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")), 2
            ).cast("double").alias("revenue"),
            F.count("*").alias("item_count"),
        )
    )


Q6_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS item_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 25
"""

QUERIES = {
    "tpch_q1_pricing_summary": q1_pricing_summary,
    "tpch_q3_top_revenue_orders": q3_top_revenue_orders,
    "tpch_q5_local_supplier_volume": q5_local_supplier_volume,
    "tpch_q6_forecast_revenue": q6_forecast_revenue,
}

ORACLE = {
    "tpch_q1_pricing_summary": Q1_ORACLE,
    "tpch_q3_top_revenue_orders": Q3_ORACLE,
    "tpch_q5_local_supplier_volume": Q5_ORACLE,
    "tpch_q6_forecast_revenue": Q6_ORACLE,
}
