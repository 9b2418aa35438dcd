"""Core aggregate operators — the reference's §2.4 inventory (A1-A14,
A17) re-expressed on the star schema.

Each reference aggregation family maps 1:1 onto a testdata query
(mapping table: FIXTURES.md §2).  All are Catalyst hash aggregations
with map-side partial aggregation; every computed column is aliased so
the DuckDB oracle twin hash-matches (driver contract).

Scale notes:
- Explode-then-aggregate (A1) multiplies rows *before* the shuffle, but
  the partial aggregate collapses them per-partition first; grouping
  cardinality (distinct words/brands) stays tiny, so the exchange is
  negligible at any SF.
- Joins against `part`/`supplier` are AQE/size-decided, never hinted
  (r8 sweep: both tables scale ×SF — part is SF×200k rows, supplier
  SF×10k — so a forced hint would OOM the build side at 100 TB exactly
  like the banned customer/orders hints; at test SFs AQE broadcasts
  them and lineitem still never shuffles for them).  Only nation (25
  rows) and region (5) keep explicit hints anywhere in the engine.
- Bin queries (A4, A10, A11) are single-pass CASE WHEN + hash agg over
  a handful of groups — the 100 TB plan is scan-bound, as it should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table
from ._rounding import _avg_dec

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


# --------------------------------------------------------------------------
# A1: exploded multi-valued column → revenue ranking
# (reference: spark_eda.py:70-85 — explode genres, sum revenue, count)
def a1_word_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.explode(F.split(F.col("p_name"), " ")).alias("word"),
            _rev().alias("revenue"),
        )
        .where(F.col("word").isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(
            F.round(F.sum(F.col("revenue").cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
            F.count("*").alias("item_count"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("word"))
    )


A1_ORACLE = f"""
SELECT word,
       CAST(ROUND(SUM(CAST(revenue AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
       COUNT(*) AS item_count
FROM (
  SELECT UNNEST(string_split(p_name, ' ')) AS word,
         {_REV_SQL} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
WHERE word IS NOT NULL AND word <> ''
GROUP BY word
ORDER BY total_revenue DESC, word
"""


# --------------------------------------------------------------------------
# A2: per-entity metrics, NOT exploded (reference: spark_eda.py:97-114 —
# developer metrics grouped on the whole cleaned string)
def a2_supplier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
            F.round(F.sum("l_quantity"), 2).alias("total_quantity"),
            F.count("*").alias("item_count"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("s_name"))
    )


A2_ORACLE = f"""
SELECT s_name,
       CAST(ROUND(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
       ROUND(SUM(l_quantity), 2) AS total_quantity,
       COUNT(*) AS item_count
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY total_revenue DESC, s_name
"""


# --------------------------------------------------------------------------
# A3: time trend by year (reference: spark_eda.py:124-147 — substring
# year; engine uses real date parts, string-prefix twin lives in
# functions/cleaning.py for games-schema fidelity)
def a3_year_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count("*").alias("order_count"),
        )
        .orderBy("o_year")
    )


A3_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(o_totalprice), 2) AS total_revenue,
       COUNT(*) AS order_count
FROM orders
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# A4: CASE-WHEN price bins → per-bin average of a second metric
# (reference: spark_eda.py:156-177 — price bins vs avg owners)
def _price_bin():
    return (
        F.when(F.col("o_totalprice") < 50_000, "00-50k")
    .when(F.col("o_totalprice") < 150_000, "050k-150k")
    .when(F.col("o_totalprice") < 300_000, "150k-300k")
    .when(F.col("o_totalprice") < 450_000, "300k-450k")
    .otherwise("450k+")
    )
_PRICE_BIN_SQL = """CASE
  WHEN o_totalprice < 50000 THEN '00-50k'
  WHEN o_totalprice < 150000 THEN '050k-150k'
  WHEN o_totalprice < 300000 THEN '150k-300k'
  WHEN o_totalprice < 450000 THEN '300k-450k'
  ELSE '450k+' END"""


def a4_price_bin_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return (
        # customer scales ×SF — no broadcast hint, AQE decides.
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(_price_bin().alias("price_bin"))
        .agg(
            _avg_dec(F.col("c_acctbal"), 2).alias("avg_acctbal"),
            F.count("*").alias("order_count"),
        )
        .orderBy("price_bin")
    )


A4_ORACLE = f"""
SELECT {_PRICE_BIN_SQL} AS price_bin,
       floor(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(c_acctbal) * 100.0 + 0.5) / 100.0 AS avg_acctbal,
       COUNT(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY price_bin
ORDER BY price_bin
"""


# --------------------------------------------------------------------------
# A5: top-1 entity by aggregate (reference: spark_eda.py:206-214 —
# top developer via orderBy().first(); engine keeps it a DataFrame)
def a5_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"))
        .orderBy(F.col("total_revenue").desc(), F.col("s_suppkey"))
        .limit(1)
    )


A5_ORACLE = f"""
SELECT s_suppkey, s_name, CAST(ROUND(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY total_revenue DESC, s_suppkey
LIMIT 1
"""


# --------------------------------------------------------------------------
# A8: group by derived cardinality (reference: spark_eda.py:304-318 —
# genre_count = size of split array)
def a8_word_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy(F.size(F.split(F.col("p_name"), " ")).alias("word_count"))
        .agg(
            F.count("*").alias("part_count"),
            _avg_dec(F.col("p_retailprice"), 2).alias("avg_price"),
            _avg_dec(F.col("p_size"), 2).alias("avg_size"),
        )
        .orderBy("word_count")
    )


A8_ORACLE = """
SELECT CAST(len(string_split(p_name, ' ')) AS INTEGER) AS word_count,
       COUNT(*) AS part_count,
       floor(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(p_retailprice) * 100.0 + 0.5) / 100.0 AS avg_price,
       floor(CAST(SUM(CAST(p_size AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(p_size) * 100.0 + 0.5) / 100.0 AS avg_size
FROM part
GROUP BY word_count
ORDER BY word_count
"""


# --------------------------------------------------------------------------
# A9: month distribution (reference: spark_eda.py:465-472 — substring
# month histogram)
def a9_month_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.month("o_orderdate").alias("o_month"))
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_month")
    )


A9_ORACLE = """
SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
       COUNT(*) AS order_count
FROM orders
GROUP BY o_month
ORDER BY o_month
"""


# --------------------------------------------------------------------------
# A10/A11: histograms over value bins (reference: spark_eda.py:478-506)
def _retail_bin():
    return (
        F.when(F.col("p_retailprice") < 920, "[900,920)")
    .when(F.col("p_retailprice") < 940, "[920,940)")
    .when(F.col("p_retailprice") < 960, "[940,960)")
    .when(F.col("p_retailprice") < 980, "[960,980)")
    .otherwise("[980,1000)")
    )
_RETAIL_BIN_SQL = """CASE
  WHEN p_retailprice < 920 THEN '[900,920)'
  WHEN p_retailprice < 940 THEN '[920,940)'
  WHEN p_retailprice < 960 THEN '[940,960)'
  WHEN p_retailprice < 980 THEN '[960,980)'
  ELSE '[980,1000)' END"""


def a10_retailprice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy(_retail_bin().alias("price_range"))
        .agg(F.count("*").alias("part_count"))
        .orderBy("price_range")
    )


A10_ORACLE = f"""
SELECT {_RETAIL_BIN_SQL} AS price_range, COUNT(*) AS part_count
FROM part GROUP BY price_range ORDER BY price_range
"""

def _size_bin():
    return (
        F.when(F.col("p_size") < 10, "00-09")
    .when(F.col("p_size") < 20, "10-19")
    .when(F.col("p_size") < 30, "20-29")
    .when(F.col("p_size") < 40, "30-39")
    .otherwise("40+")
    )
_SIZE_BIN_SQL = """CASE
  WHEN p_size < 10 THEN '00-09'
  WHEN p_size < 20 THEN '10-19'
  WHEN p_size < 30 THEN '20-29'
  WHEN p_size < 40 THEN '30-39'
  ELSE '40+' END"""


def a11_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy(_size_bin().alias("size_range"))
        .agg(F.count("*").alias("part_count"))
        .orderBy("size_range")
    )


A11_ORACLE = f"""
SELECT {_SIZE_BIN_SQL} AS size_range, COUNT(*) AS part_count
FROM part GROUP BY size_range ORDER BY size_range
"""


# --------------------------------------------------------------------------
# A12: group by whole combo string (reference: spark_eda.py:589-601 —
# genre-combination revenue, un-exploded)
def a12_brand_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.concat_ws(" ", "p_brand", "p_type").alias("combo")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("combo")
        .agg(
            F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
            F.count("*").alias("item_count"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("combo"))
    )


A12_ORACLE = f"""
SELECT p_brand || ' ' || p_type AS combo,
       CAST(ROUND(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
       COUNT(*) AS item_count
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY combo
ORDER BY total_revenue DESC, combo
"""


# --------------------------------------------------------------------------
# A13: global (group-less) totals (reference: spark_eda.py:570)
def a13_global_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
        F.count("*").alias("item_count"),
        _avg_dec(F.col("l_extendedprice"), 2).alias("avg_price"),
    )


A13_ORACLE = f"""
SELECT CAST(ROUND(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
       COUNT(*) AS item_count,
       floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(l_extendedprice) * 100.0 + 0.5) / 100.0 AS avg_price
FROM lineitem
"""


# --------------------------------------------------------------------------
# A14: per-year averages (reference: spark_eda.py:665-696)
def a14_year_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(_avg_dec(F.col("o_totalprice"), 2).alias("avg_price"))
        .orderBy("o_year")
    )


A14_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(o_totalprice) * 100.0 + 0.5) / 100.0 AS avg_price
FROM orders
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# A17: percentile aggregates.  The oracle-checked twin uses EXACT
# percentile (SURVEY.md §7 risk register: percentile_approx won't
# hash-match DuckDB); the approx variants stay rows-only checked.
def a17_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
            F.count("*").alias("order_count"),
        )
        .orderBy("o_orderpriority")
    )


A17_ORACLE = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       COUNT(*) AS order_count
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def a17b_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-aggregate capability (reference: spark_eda.py:250
    PERCENTILE_APPROX).  Rows-only checked: approximate answers are not
    oracle-hashable by design; at 100 TB these are the variants you run."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.round(F.percentile_approx("l_extendedprice", 0.5), 2).alias(
                "approx_median_price"
            ),
            F.count("*").alias("item_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# O6: seeded random sampling (reference: spark_eda.py:513-516, unseeded;
# engine pins the seed).  Rows-only: DuckDB cannot reproduce Spark's
# sampler (SURVEY.md §7 risk register).
def o6_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.sample(withReplacement=False, fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(5000)
    )


QUERIES = {
    "a1_word_revenue": a1_word_revenue,
    "a2_supplier_metrics": a2_supplier_metrics,
    "a3_year_trend": a3_year_trend,
    "a4_price_bin_acctbal": a4_price_bin_acctbal,
    "a5_top_supplier": a5_top_supplier,
    "a8_word_count_stats": a8_word_count_stats,
    "a9_month_distribution": a9_month_distribution,
    "a10_retailprice_histogram": a10_retailprice_histogram,
    "a11_size_histogram": a11_size_histogram,
    "a12_brand_type_revenue": a12_brand_type_revenue,
    "a13_global_totals": a13_global_totals,
    "a14_year_avg_price": a14_year_avg_price,
    "a17_percentiles": a17_percentiles,
    "a17b_approx_aggregates": a17b_approx_aggregates,
    "o6_seeded_sample": o6_seeded_sample,
}

ORACLE = {
    "a1_word_revenue": A1_ORACLE,
    "a2_supplier_metrics": A2_ORACLE,
    "a3_year_trend": A3_ORACLE,
    "a4_price_bin_acctbal": A4_ORACLE,
    "a5_top_supplier": A5_ORACLE,
    "a8_word_count_stats": A8_ORACLE,
    "a9_month_distribution": A9_ORACLE,
    "a10_retailprice_histogram": A10_ORACLE,
    "a11_size_histogram": A11_ORACLE,
    "a12_brand_type_revenue": A12_ORACLE,
    "a13_global_totals": A13_ORACLE,
    "a14_year_avg_price": A14_ORACLE,
    "a17_percentiles": A17_ORACLE,
    # a17b_approx_aggregates, o6_seeded_sample: rows-only by design
}
