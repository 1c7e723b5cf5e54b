"""Advanced SQL shapes: correlated/scalar subqueries and disjunctive
predicates, TPC-H-style (Q4/Q14/Q17/Q18/Q19/Q22 analogs on the fixture
star schema).

The reference is a single-table pipeline (SURVEY.md §0); these complete the
relational surface a user would expect from an analytics engine: EXISTS with
a non-equi correlation (Q4), conditional-ratio aggregation over a join
(Q14), a correlated scalar subquery rewritten as aggregate-then-join (Q17),
HAVING-subquery membership (Q18), disjunctive multi-branch predicates (Q19),
and a global scalar subquery feeding an anti join (Q22).

Scale notes — every shape here avoids the naive per-row subquery plan:

* Q17's correlated scalar subquery is a whole-frame window average (one
  shuffle of the brand-filtered slice serves both the per-key average and
  the row comparison); Q18's HAVING-subquery is a grouped pre-aggregation
  joined back on the key — one shuffle of the fact, never a re-scan per
  outer row. This is the decorrelation Catalyst would have to derive from
  the SQL form — written directly so the plan is guaranteed.
* Q22's scalar subquery is a 1-row aggregate broadcast into a filter; the
  anti join runs on the (tiny) filtered customer side against orders keys.
* Q19's OR-of-ANDs stays one join: the disjunction is a residual filter on
  a single broadcast hash join, not a union of three joins (which would
  scan lineitem three times).

All six are shelved (pytest-hash-checked vs DuckDB at the test SF): the
external driver's 50-row budget is held by the declared registry; these
keep the same correctness bar via tests/test_queries_oracle.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.queries.core import load
from realtime_data_pipeline_spark.queries.util import DEC, dsum


def order_priority_check_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 analog: orders (one quarter) that have at least one lineitem
    shipped AFTER the order date, counted per priority. The EXISTS
    correlation has a non-equi term, so the semi join carries
    ``l_shipdate > o_orderdate`` as a join-side filter on the equi-key
    hash join — one shuffle, no per-row subquery."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    orders = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_CHECK_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def promo_revenue_ratio_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 analog: percentage of one month's revenue from PROMO parts.
    lineitem slice (pushed-down month filter) joins part on the key;
    both the conditional numerator and the denominator come from ONE
    aggregation pass (SUM(CASE...) — the same single-scan rewrite as the
    DQ engine's A2)."""
    lo = F.lit("1995-09-01").cast("timestamp")
    hi = F.lit("1995-10-01").cast("timestamp")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    joined = li.join(part, li.l_partkey == part.p_partkey, "inner")
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
                F.lit(0).cast(DEC)
            )).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct"),
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
    )


PROMO_REVENUE_RATIO_Q14_SQL = """
SELECT
  ROUND(100.0
    * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))
        ELSE CAST(0 AS DECIMAL(38,10)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))
        AS DOUBLE), 4) AS promo_revenue_pct,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2)
    AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 analog: average yearly revenue lost if small-quantity orders
    (below 50% of the part's average quantity) for one brand went
    unfilled. The correlated scalar subquery ``0.5 * AVG(l_quantity)
    WHERE l_partkey = outer.l_partkey`` is decorrelated as a whole-frame
    window average over the part key: ONE shuffle of the brand's slice
    serves both the per-part average and the row-level comparison —
    strictly better than aggregate-then-join-back (two shuffles of the
    slice plus a join). The brand filter broadcasts into the single
    lineitem scan, so the slice is ~1/|brands| of the table.

    l_quantity is integer-valued, so the double AVG is exact and the
    threshold comparison is engine-deterministic (no decimal dance
    needed for the correlation — only the final revenue sum)."""
    from pyspark.sql import Window

    brand_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(brand_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "inner",
        )
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn(
            "qty_limit", F.lit(0.5) * F.avg("l_quantity").over(w)
        )
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 2)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lineitems"),
        )
    )


SMALL_QUANTITY_REVENUE_Q17_SQL = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
limits AS (
  SELECT l_partkey AS lim_partkey, 0.5 * AVG(l_quantity) AS qty_limit
  FROM brand_li GROUP BY 1
)
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / 7.0, 2)
    AS avg_yearly,
  COUNT(*) AS n_small_lineitems
FROM brand_li JOIN limits ON l_partkey = lim_partkey
WHERE l_quantity < qty_limit
"""


def large_order_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 analog: customers who placed orders totalling > 300 units.
    The HAVING-subquery membership test is a grouped pre-aggregation of
    lineitem (one shuffle on the order key, map-side partials doing most
    of the reduction) inner-joined back to orders — at 100 TB the
    filtered key set is tiny, so the orders/customer joins that follow
    run on a few thousand rows."""
    big = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


LARGE_ORDER_CUSTOMERS_Q18_SQL = """
SELECT c_name,
       o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o_totalprice, 2) AS totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 analog: revenue from three OR'd brand/size/quantity bands.
    One broadcast hash join on the part key with the whole disjunction as
    a residual filter — NOT a union of three joins (which would scan
    lineitem three times). The shared ``l_quantity <= 30`` conjunct is
    factored out so that much still pushes into the parquet scan."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 20))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        li.filter(F.col("l_quantity") <= 30)
        .join(part, li.l_partkey == part.p_partkey, "inner")
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


DISJUNCTIVE_REVENUE_Q19_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2)
    AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity <= 30
  AND (
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
      AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
      AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
      AND l_quantity BETWEEN 20 AND 30)
  )
"""


def idle_rich_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog: customers with above-average (positive-balance)
    account balance and NO orders since 2000 (every fixture customer has
    SOME order, so the churn window keeps the anti join non-vacuous),
    rolled up per market segment. Two subquery shapes in one plan: the
    global scalar subquery (average balance) is a 1-row aggregate
    broadcast into the filter, and NOT EXISTS is a left-anti join
    against the recent-order custkeys (date filter pushed to that scan).

    The average is computed as exact decimal sum / count so both engines
    derive the identical threshold (a double AVG would be sum-order
    dependent)."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)) / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_bal")
        )
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


IDLE_RICH_CUSTOMERS_Q22_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE)
         AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) / COUNT(*) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "order_priority_check_q4": order_priority_check_q4,
    "promo_revenue_ratio_q14": promo_revenue_ratio_q14,
    "small_quantity_revenue_q17": small_quantity_revenue_q17,
    "large_order_customers_q18": large_order_customers_q18,
    "disjunctive_revenue_q19": disjunctive_revenue_q19,
    "idle_rich_customers_q22": idle_rich_customers_q22,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "order_priority_check_q4": ORDER_PRIORITY_CHECK_Q4_SQL,
    "promo_revenue_ratio_q14": PROMO_REVENUE_RATIO_Q14_SQL,
    "small_quantity_revenue_q17": SMALL_QUANTITY_REVENUE_Q17_SQL,
    "large_order_customers_q18": LARGE_ORDER_CUSTOMERS_Q18_SQL,
    "disjunctive_revenue_q19": DISJUNCTIVE_REVENUE_Q19_SQL,
    "idle_rich_customers_q22": IDLE_RICH_CUSTOMERS_Q22_SQL,
}
