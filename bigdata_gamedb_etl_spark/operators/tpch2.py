"""Second TPC-H wave: the join/semi-join/disjunction shapes the first
wave (operators/tpch.py) doesn't cover, adapted to the driver schema
(no l_shipmode/commitdate/receiptdate columns — Q4/Q12's lateness
predicate becomes a returned-flag predicate with the same plan shape).

Capability mapping (reference has zero joins; these declare the analytic
join surface SURVEY.md §2.6 expects at TPC-H shape):
- Q4: EXISTS → left-semi join + count by priority.
- Q10: fact⋈fact⋈dim ranking with top-k (TakeOrderedAndProject).
- Q14: conditional aggregate ratio (CASE inside SUM), month slice.
- Q18: HAVING on a fact-side aggregate feeding a second join
  (aggregate-then-join keeps the big side small before the shuffle).
- Q19: disjunctive multi-column predicate — Catalyst pushes the
  OR-of-ANDs partially into the part/lineitem scans and prunes with
  the common sub-predicates.

Money sums use the DECIMAL(18,6)-then-round recipe (see tpch.py Q1) so
run-order float noise can't flip round-2 boundaries.
Scale notes: orders/customer are never hint-broadcast (they grow ×SF;
AQE decides); aggregates sit fact-side before joins where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table
from ._rounding import _fr

Q4_START, Q4_END = "1996-01-01", "1996-04-01"
Q14_START, Q14_END = "1996-01-01", "1996-02-01"
Q18_MIN_QTY = 300


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"
_DEC_REV = f"CAST(ROUND(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))), 2) AS DOUBLE)"


def _sum_rev(alias: str):
    return (
        F.round(F.sum(_rev().cast("decimal(18,6)")), 2).cast("double").alias(alias)
    )


# --------------------------------------------------------------------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders in a quarter having ≥1 returned lineitem,
    counted per priority.  EXISTS compiles to a left-semi join — the
    lineitem side is filtered before the shuffle and no order row
    duplicates."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    returned = table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in a
    quarter.  lineitem filters on the return flag before the join;
    nation broadcasts; final top-k is TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_sum_rev("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {_DEC_REV} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share for one month — conditional SUM
    ratio.  Both sums are exact decimals cast to double before the
    division, so the ratio is bit-identical across engines."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_END).cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0)).cast(
            "decimal(18,6)"
        )
    )
    total = F.sum(_rev().cast("decimal(18,6)"))
    return joined.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / total.cast("double"), 4
        ).alias("promo_revenue_pct"),
        F.round(total, 2).cast("double").alias("total_revenue"),
    )


Q14_ORACLE = f"""
SELECT
  ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0.0 END
                            AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST({_REV_SQL} AS DECIMAL(18,6))) AS DOUBLE), 4)
    AS promo_revenue_pct,
  {_DEC_REV} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q14_END} 00:00:00'
"""


# --------------------------------------------------------------------------
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds a threshold, with
    their customer.  The aggregate runs FACT-SIDE FIRST (groupBy
    lineitem → HAVING) so only qualifying orderkeys reach the joins —
    at 100 TB that turns a fact⋈fact join into a small⋈fact join."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > Q18_MIN_QTY)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 2) > {Q18_MIN_QTY}
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


# --------------------------------------------------------------------------
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under an OR of (brand, size-range, qty-range)
    conjunctions — the disjunctive-pushdown benchmark.  The part side
    broadcasts with its brand/size predicates pushed; the residual OR
    evaluates post-join inside codegen."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
    )
    return joined.where(cond).agg(
        _sum_rev("revenue"), F.count("*").alias("item_count")
    )


Q19_ORACLE = f"""
SELECT {_DEC_REV} AS revenue, COUNT(*) AS item_count
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
"""


# --------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (min-per-group + join back, adapted: no partsupp table —
    unit price observed on lineitem stands in for supplycost): for each
    size-1 part, the supplier with the lowest average unit price.
    The per-group argmin is a window rank over the aggregated
    (part, supplier) grain — aggregate first, window second, so the
    window sorts grouped rows, not raw lineitems."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    p = table(spark, sf_dir, "part").where(F.col("p_size") == 1).select(
        "p_partkey", "p_name"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    from pyspark.sql import Window

    per_ps = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(
            # decimal-exact sum / count via the floor recipe — AVG of a
            # DECIMAL returns DECIMAL in Spark but DOUBLE in DuckDB,
            # so the old round-the-average form was engine-divergent
            # on the scale semantics (r8 round-on-average sweep)
            _fr(
                F.sum(
                    (F.col("l_extendedprice") / F.col("l_quantity")).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count("l_quantity"),
                4,
            ).alias("avg_unit_price")
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("avg_unit_price", "l_suppkey")
    return (
        per_ps.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "avg_unit_price")
        .orderBy("p_partkey")
    )


Q2_ORACLE = """
WITH per_ps AS (
  SELECT p_partkey, p_name, l_suppkey,
         floor(CAST(SUM(CAST(l_extendedprice / l_quantity AS DECIMAL(18,6)))
                    AS DOUBLE)
               / COUNT(l_quantity) * 10000.0 + 0.5) / 10000.0
           AS avg_unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = 1 AND l_quantity > 0
  GROUP BY p_partkey, p_name, l_suppkey
)
SELECT p_partkey, p_name, s_name, avg_unit_price
FROM per_ps JOIN supplier ON l_suppkey = s_suppkey
QUALIFY ROW_NUMBER() OVER (PARTITION BY p_partkey
                           ORDER BY avg_unit_price, l_suppkey) = 1
ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) whose quarterly revenue equals the max —
    aggregate → global-max scalar → equality filter.  The max arrives
    via a 1-row broadcast join (a window over an unpartitioned frame
    would funnel every group through one task)."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q4_END).cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(_sum_rev("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {_DEC_REV} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q4_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q4_END} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
def q16_supplier_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute group —
    COUNT(DISTINCT) over a join, descending-count report."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").where(F.col("p_type") != "PROMO").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average positive balance and NO
    orders, counted per market segment — scalar subquery (1-row
    broadcast) + anti join (adapted: mktsegment stands in for the
    phone country code)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: revenue flowing between a nation pair per ship-year —
    the widest join in the suite (lineitem ⋈ orders ⋈ customer ⋈ n1,
    lineitem ⋈ supplier ⋈ n2) with a symmetric pair predicate.  Both
    nation joins hint-broadcast (true dims); supplier is un-hinted and
    broadcasts under AQE's size check while it fits; orders/customer
    stay shuffle joins on the fact grain."""
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.where(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.where(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_sum_rev("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {_DEC_REV} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
    AND n2.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (no l_shipmode column — l_linestatus carries the
    grouping): per line status in a ship-year, CASE-split counts of
    urgent vs non-urgent orders.  The conditional aggregate runs
    map-side; orders joins on the fact key without a broadcast hint."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: two-level aggregation over a LEFT join — orders per
    customer (zero-order customers kept by the outer join), then the
    distribution of customers by that count.  The second groupBy keys on
    a tiny domain (distinct order counts), so the second shuffle is
    negligible; the first is the customer-grain shuffle Q13 requires."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part average — revenue from lineitems
    whose quantity is below 20% of their part's average quantity, for
    one brand.  The correlated scalar subquery becomes aggregate-then-
    join: per-part averages are computed once on the brand-filtered
    fact slice and joined back (both sides pre-filtered by the same
    part slice — AQE-broadcast while it fits — so the per-part agg is
    small and broadcasts under AQE)."""
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(p, F.col("l_partkey") == F.col("p_partkey"))
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


Q17_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE)
         AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# --------------------------------------------------------------------------
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (no commit/receipt dates — the 'late' predicate becomes
    the returned flag): suppliers who returned a line on a finished
    multi-supplier order where NO other supplier returned one.

    The textbook form is a semi join plus an anti join against the same
    fact table under correlated non-equi predicates — which Spark can
    only execute by broadcasting the distinct (orderkey, suppkey) pairs
    of LINEITEM, a fact-side broadcast that OOMs at scale (measured
    10.6 s at sf0.1).  Both EXISTS subqueries are really per-order
    supplier counts, so the whole query collapses to one aggregation
    tree: per (order, supplier) → did it return; per order → supplier
    count, returner count, and the sole returner's key.  A pair
    survives iff nsupp >= 2 and nret == 1.  One lineitem scan, one
    shuffle of (two longs + bit) with map-side combine, no fact
    broadcast — 6x faster locally and the shape survives 100 TB."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("nsupp"),
        F.sum("ret").alias("nret"),
        F.max(F.when(F.col("ret") == 1, F.col("l_suppkey"))).alias("sole_suppkey"),
    )
    return (
        per_order.where((F.col("nsupp") >= 2) & (F.col("nret") == 1))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(s, F.col("sole_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_ORACLE = """
WITH l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem
  WHERE l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM orders
                WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
)
SELECT s_name, COUNT(*) AS numwait
FROM l1 JOIN supplier ON l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --------------------------------------------------------------------------
Q8_TARGET_NATION = "NATION_3"
Q8_REGION = "ASIA"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of revenue among a region's
    customers, per order-year — a conditional-aggregate ratio
    (CASE-sum / sum) on top of a 6-table join.  nation/region broadcast
    as fixed-cardinality dims; the un-hinted supplier join carries the
    numerator flag so the share needs no second pass."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    n_c = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    flagged = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        flagged.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == Q8_TARGET_NATION, rev).otherwise(F.lit(0).cast("decimal(18,6)")))
                / F.sum(rev),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = f"""
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(ROUND(
         SUM(CASE WHEN n2.n_name = '{Q8_TARGET_NATION}'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END)
         / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = '{Q8_REGION}'
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier-nation per year over parts whose
    name contains a substring (no partsupp/supplycost column — cost is
    modeled as 50% of the part's retail price per unit).  The part
    filter broadcasts and prunes lineitem before the orders join."""
    p = table(spark, sf_dir, "part").where(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           - 0.5 * p_retailprice * l_quantity
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# --------------------------------------------------------------------------
Q11_FRACTION = 0.0007


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose shipped value exceeds a FRACTION of the
    global total (no partsupp — shipped lineitem value stands in for
    stock value).  Aggregate once, derive the global threshold from the
    same aggregate via a 1-row broadcast, filter — the aggregate is
    computed one time, not once per row as the literal SQL subquery
    implies."""
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(_sum_rev("part_value"))
    total = per_part.agg(
        (F.sum("part_value") * Q11_FRACTION).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey, {_DEC_REV} AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT SUM(part_value) * {Q11_FRACTION} FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


# --------------------------------------------------------------------------
Q20_SHARE = 0.12


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped more than a SHARE of a part's total
    volume, for parts of one brand — nested aggregate (per-part total →
    per-(part,supplier) share) feeding a semi join on supplier.  Both
    aggregates sit on the same (partkey[, suppkey]) grain, so the
    second reuses the first's shuffle partitioning."""
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#2").select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("ps_qty")
    )
    per_part = per_ps.groupBy("l_partkey").agg(F.sum("ps_qty").alias("part_qty"))
    heavy = (
        per_ps.join(per_part, "l_partkey")
        .where(F.col("ps_qty") > Q20_SHARE * F.col("part_qty"))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_ORACLE = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS ps_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'
  GROUP BY l_partkey, l_suppkey
),
per_part AS (
  SELECT l_partkey, SUM(ps_qty) AS part_qty FROM per_ps GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_part USING (l_partkey)
  WHERE ps_qty > {Q20_SHARE} * part_qty
)
ORDER BY s_suppkey
"""


QUERIES = {
    "tpch_q4_order_priority": q4_order_priority,
    "tpch_q10_returned_revenue": q10_returned_revenue,
    "tpch_q14_promo_revenue": q14_promo_revenue,
    "tpch_q18_large_volume": q18_large_volume_customers,
    "tpch_q19_disjunctive": q19_disjunctive_revenue,
    "tpch_q2_min_cost_supplier": q2_min_cost_supplier,
    "tpch_q15_top_supplier": q15_top_supplier,
    "tpch_q16_supplier_cardinality": q16_supplier_cardinality,
    "tpch_q22_dormant_rich": q22_dormant_rich_customers,
    "tpch_q7_volume_shipping": q7_volume_shipping,
    "tpch_q12_priority_by_status": q12_priority_by_status,
    "tpch_q13_customer_distribution": q13_customer_distribution,
    "tpch_q17_small_quantity": q17_small_quantity_revenue,
    "tpch_q21_sole_returned": q21_sole_returned_supplier,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q9_product_profit": q9_product_profit,
    "tpch_q11_important_stock": q11_important_stock,
    "tpch_q20_excess_shippers": q20_excess_shippers,
}

ORACLE = {
    "tpch_q4_order_priority": Q4_ORACLE,
    "tpch_q10_returned_revenue": Q10_ORACLE,
    "tpch_q14_promo_revenue": Q14_ORACLE,
    "tpch_q18_large_volume": Q18_ORACLE,
    "tpch_q19_disjunctive": Q19_ORACLE,
    "tpch_q2_min_cost_supplier": Q2_ORACLE,
    "tpch_q15_top_supplier": Q15_ORACLE,
    "tpch_q16_supplier_cardinality": Q16_ORACLE,
    "tpch_q22_dormant_rich": Q22_ORACLE,
    "tpch_q7_volume_shipping": Q7_ORACLE,
    "tpch_q12_priority_by_status": Q12_ORACLE,
    "tpch_q13_customer_distribution": Q13_ORACLE,
    "tpch_q17_small_quantity": Q17_ORACLE,
    "tpch_q21_sole_returned": Q21_ORACLE,
    "tpch_q8_market_share": Q8_ORACLE,
    "tpch_q9_product_profit": Q9_ORACLE,
    "tpch_q11_important_stock": Q11_ORACLE,
    "tpch_q20_excess_shippers": Q20_ORACLE,
}
