"""Join and set operators over the star schema.

The reference has **zero** joins — stage 3 brags about designing around
them with HBase wide rows (reference: stage3.md:67).  Spark gives the
capability for free; the engine declares the full join surface the
driver's oracle harness expects (SURVEY.md §2.6).

Scale notes:
- Only the fixed-cardinality dimensions (region: 5 rows, nation: 25)
  carry explicit broadcast hints.  Every SF-proportional table —
  customer, orders, AND part/supplier (r8 sweep: they grow ×SF too,
  just slower) — is AQE/size-decided: an explicit hint overrides AQE's
  size check and would OOM the build side at 100×; un-hinted, AQE
  broadcasts it while it fits and falls back to shuffle join when it
  doesn't.
- Semi/anti joins use Spark's dedicated left_semi/left_anti plans —
  no row duplication, no post-join distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


# --------------------------------------------------------------------------
# Star join: fact → dims chain, revenue per region (TPC-H Q5 shape
# without the supplier-colocation predicate)
def j1_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer scales ×SF — no hint, AQE decides.
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
            F.count("*").alias("item_count"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("r_name"))
    )


J1_ORACLE = f"""
SELECT r_name,
       CAST(ROUND(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
       COUNT(*) AS item_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY total_revenue DESC, r_name
"""


# --------------------------------------------------------------------------
# Left-semi: customers that have at least one order
def j2_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


J2_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Left-anti: customers with no orders
def j3_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


J3_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Left-outer with null-preserving aggregates
def j4_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


J4_ORACLE = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS order_count,
       ROUND(SUM(COALESCE(o_totalprice, 0.0)), 2) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Set ops: INTERSECT / EXCEPT (SURVEY.md §2.6 set-ops row)
def j5_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    with_cust = n.join(c, F.col("n_nationkey") == F.col("c_nationkey"), "left_semi")
    with_supp = n.join(s, F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
    return with_cust.intersect(with_supp).orderBy("n_nationkey")


J5_ORACLE = """
SELECT n_nationkey, n_name FROM nation
WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
INTERSECT
SELECT n_nationkey, n_name FROM nation
WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
ORDER BY n_nationkey
"""


def j6_nations_customers_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    with_cust = n.join(c, F.col("n_nationkey") == F.col("c_nationkey"), "left_semi")
    with_supp = n.join(s, F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
    return with_cust.exceptAll(with_supp).orderBy("n_nationkey")


J6_ORACLE = """
SELECT n_nationkey, n_name FROM nation
WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
EXCEPT ALL
SELECT n_nationkey, n_name FROM nation
WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
ORDER BY n_nationkey
"""


# --------------------------------------------------------------------------
# Union: one normalized account-balance ledger across entity kinds
def j7_union_acctbal_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("entity_key"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("entity_key"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )
    return c.unionByName(s).orderBy("kind", "entity_key")


J7_ORACLE = """
SELECT 'customer' AS kind, c_custkey AS entity_key, ROUND(c_acctbal, 2) AS acctbal
FROM customer
UNION ALL
SELECT 'supplier' AS kind, s_suppkey AS entity_key, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
ORDER BY kind, entity_key
"""


# --------------------------------------------------------------------------
# Two-dim enrichment: fact + part + supplier in one pass (both
# AQE-broadcast at test SFs; shuffle joins at 100 TB where they grow)
def j8_brand_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "s_name")
        .agg(F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"))
        .orderBy("p_brand", "s_name")
    )


J8_ORACLE = f"""
SELECT p_brand, s_name, CAST(ROUND(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand, s_name
ORDER BY p_brand, s_name
"""

# --------------------------------------------------------------------------
# Skew-resistant join: the salted-join utility surfaced as a driver
# query.  Semantically identical to the plain orders ⋈ customer join —
# the oracle IS the plain join — but the physical shuffle key is
# (custkey, salt), spreading any hot customer over 8 reducers.
def j9_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value per market segment via functions.skew.salted_join.

    Scale: AQE's skew-join splits oversized post-shuffle partitions,
    but only at stage boundaries it can see; salting handles the
    pathological single-hot-key case deterministically (no rand()),
    and this query proves the rewrite is result-identical to the
    un-salted join under the driver's hash gate."""
    from ..functions.skew import salted_join

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        o, c, F.col("o_custkey") == F.col("c_custkey"), distinct_col="o_totalprice"
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("segment_value"),
            F.count("*").alias("order_count"),
        )
        .orderBy("c_mktsegment")
    )


J9_ORACLE = """
SELECT c_mktsegment,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS segment_value,
       COUNT(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Market-basket co-occurrence: the part pairs most often ordered
# together — the classic frequent-itemset self-join.  The quadratic
# blow-up is bounded by the per-basket line count (TPC-H caps lineitems
# per order at 7; our generator at 13), so the self-join on l_orderkey
# emits ≤ C(13,2) pairs per order — linear in order count at any SF.
# For unbounded baskets the per-key cap pattern from
# dedup.SHINGLE_DF_CAP applies.  One shuffle on l_orderkey (both sides
# co-partition), then a hash-agg on pair keys.
BASKET_TOP_K = 20


def j10_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    return (
        pairs.groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_baskets"))
        .orderBy(F.col("n_baskets").desc(), "part_a", "part_b")
        .limit(BASKET_TOP_K)
    )


J10_ORACLE = f"""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_baskets
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
ORDER BY n_baskets DESC, part_a, part_b
LIMIT {BASKET_TOP_K}
"""


# --------------------------------------------------------------------------
# Non-equi band join: bucket customers into account-balance tiers via a
# literal bounds table.  lo is inclusive, hi exclusive; the open-ended
# top tier uses a NULL hi.  Tier bounds are exact integers, so the
# double comparisons are deterministic cross-engine.
ACCTBAL_TIERS = [
    ("T1_subzero", -100000.0, 0.0),
    ("T2_low", 0.0, 2500.0),
    ("T3_mid", 2500.0, 5000.0),
    ("T4_high", 5000.0, 7500.0),
    ("T5_top", 7500.0, None),
]


def j11_acctbal_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers per balance tier via a range (non-equi) join against
    the 5-row tier table: count, exact mean balance, share of total.

    Scale shape: the tier table broadcasts (BroadcastNestedLoopJoin —
    the ONLY correct use of BNLJ: a constant-size build side; the fact
    side streams through untouched).  A CASE-expression bucketing would
    be equivalent here, but the declared capability is the general
    range join, where the band table is data (rate cards, SLA tiers)
    rather than compile-time constants."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    tiers = spark.createDataFrame(
        ACCTBAL_TIERS, "tier STRING, lo DOUBLE, hi DOUBLE"
    )
    joined = c.join(
        F.broadcast(tiers),
        (F.col("c_acctbal") >= F.col("lo"))
        & ((F.col("hi").isNull()) | (F.col("c_acctbal") < F.col("hi"))),
    )
    total = c.agg(F.count("*").alias("total_customers"))
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
                .cast("double")
                / F.count("*"),
                2,
            ).alias("avg_bal"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "tier",
            "customers",
            "avg_bal",
            (
                F.floor(
                    F.col("customers") * 100.0 / F.col("total_customers")
                    * F.lit(10000.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("pct_of_customers"),
        )
        .orderBy("tier")
    )


def _tier_values_sql() -> str:
    return ", ".join(
        f"('{t}', {lo!r}, {'NULL' if hi is None else repr(hi)})"
        for t, lo, hi in ACCTBAL_TIERS
    )


J11_ORACLE = f"""
WITH tiers(tier, lo, hi) AS (VALUES {_tier_values_sql()}),
joined AS (
  SELECT tier, c_acctbal
  FROM customer JOIN tiers
    ON c_acctbal >= lo AND (hi IS NULL OR c_acctbal < hi)
),
total AS (SELECT COUNT(*) AS total_customers FROM customer)
SELECT tier,
       COUNT(*) AS customers,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 2) AS avg_bal,
       floor(COUNT(*) * 100.0 / MAX(total_customers) * 10000.0 + 0.5)
         / 10000.0 AS pct_of_customers
FROM joined CROSS JOIN total
GROUP BY tier
ORDER BY tier
"""


QUERIES = {
    "j1_region_revenue": j1_region_revenue,
    "j2_customers_with_orders": j2_customers_with_orders,
    "j3_customers_without_orders": j3_customers_without_orders,
    "j4_customer_order_counts": j4_customer_order_counts,
    "j5_nations_with_both": j5_nations_with_both,
    "j6_nations_customers_only": j6_nations_customers_only,
    "j7_union_acctbal_ledger": j7_union_acctbal_ledger,
    "j8_brand_supplier_revenue": j8_brand_supplier_revenue,
    "j9_salted_segment_revenue": j9_salted_segment_revenue,
    "j10_basket_part_pairs": j10_basket_part_pairs,
    "j11_acctbal_band_join": j11_acctbal_band_join,
}

ORACLE = {
    "j1_region_revenue": J1_ORACLE,
    "j2_customers_with_orders": J2_ORACLE,
    "j3_customers_without_orders": J3_ORACLE,
    "j4_customer_order_counts": J4_ORACLE,
    "j5_nations_with_both": J5_ORACLE,
    "j6_nations_customers_only": J6_ORACLE,
    "j7_union_acctbal_ledger": J7_ORACLE,
    "j8_brand_supplier_revenue": J8_ORACLE,
    "j9_salted_segment_revenue": J9_ORACLE,
    "j10_basket_part_pairs": J10_ORACLE,
    "j11_acctbal_band_join": J11_ORACLE,
}
