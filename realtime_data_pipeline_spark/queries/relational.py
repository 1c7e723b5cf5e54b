"""Relational breadth: joins (J1–J4, J6), top-k (L2–L3), window functions
(SURVEY.md §2.5), and set operations (§2.7).

The reference is a single-table pipeline with no joins; this module is the
engine-shaped completion SURVEY.md §2.3 declares, exercised on the TPC-H-ish
fixture star schema. Scale notes per query:

* dimension joins broadcast the small side explicitly (`F.broadcast`) so the
  plan is a BroadcastHashJoin with NO shuffle of the fact table — at 100 TB
  the fact side streams through map tasks; only missing-stats dims need the
  hint, but being explicit documents intent;
* fact-fact joins (lineitem⋈orders) shuffle both sides on the key once —
  unavoidable and correct; AQE handles skew (session.py);
* top-k uses TakeOrderedAndProject (no global sort); top-k per group uses a
  single shuffle on the group key via row_number;
* set ops on projected single columns keep the shuffle payload minimal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import ops
from realtime_data_pipeline_spark.queries.core import load
from realtime_data_pipeline_spark.queries.util import dsum


# ---------------------------------------------------------------------------
# J1: equi inner join chain with broadcast dims — revenue per nation.
# ---------------------------------------------------------------------------


def revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders (fact-fact, one shuffle) ⋈ customer ⋈ nation
    (broadcast dims). The canonical enrichment join the reference never had
    (SURVEY.md §2.3 J1)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


REVENUE_PER_NATION_SQL = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2)
    AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# J2: left outer join — per-customer order stats, keeping orderless customers.
# ---------------------------------------------------------------------------


def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_totalprice").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


CUSTOMER_ORDER_STATS_SQL = """
SELECT
  c_custkey,
  c_mktsegment,
  COUNT(o_totalprice) AS n_orders,
  COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DOUBLE), 0.0)
    AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


# ---------------------------------------------------------------------------
# J3: anti + semi joins.
# ---------------------------------------------------------------------------


def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — the idiomatic orphan-key check (SURVEY.md §2.3 J3).
    Filtered to >300k orders so the result is non-empty in the fixtures
    (every customer has *some* order) and the anti semantics are actually
    evidenced."""
    cust = load(spark, sf_dir, "customer")
    big = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300_000)
        .select("o_custkey")
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


CUSTOMERS_WITHOUT_BIG_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


def parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi — existence filter without duplication."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_brand"
    )


PARTS_WITH_LINEITEMS_SQL = """
SELECT p_partkey, p_brand
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
"""


# ---------------------------------------------------------------------------
# J4: theta/range join — orders bucketed into inline price bands.
# BroadcastNestedLoopJoin against a 4-row literal dim: the correct physical
# plan for a non-equi join with a tiny build side.
# ---------------------------------------------------------------------------

_PRICE_BANDS = [
    ("p1_low", 0.0, 100_000.0),
    ("p2_mid", 100_000.0, 250_000.0),
    ("p3_high", 250_000.0, 400_000.0),
    ("p4_top", 400_000.0, 1e12),
]


def orders_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_totalprice")
    bands = spark.createDataFrame(_PRICE_BANDS, ["band", "lo", "hi"])
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return (
        orders.join(F.broadcast(bands), cond, "inner")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("band_revenue"),
        )
    )


ORDERS_PRICE_BAND_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('p1_low', 0.0, 100000.0),
         ('p2_mid', 100000.0, 250000.0),
         ('p3_high', 250000.0, 400000.0),
         ('p4_top', 400000.0, 1e12)
)
SELECT
  band,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DOUBLE)
    AS band_revenue
FROM orders
JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


# ---------------------------------------------------------------------------
# J6: cross join — only sane on tiny dims (the LSH fallback shape, §2.9).
# ---------------------------------------------------------------------------


def region_nation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").select("r_name")
    nation = load(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


REGION_NATION_GRID_SQL = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


# ---------------------------------------------------------------------------
# L2: global top-k — Spark plans TakeOrderedAndProject (per-partition top-k
# + driver merge of k·P rows), never a full sort.
# ---------------------------------------------------------------------------


def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


TOP_ORDERS_BY_PRICE_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# L3: top-k per group via ops.topk_per_group (row_number window).
# ---------------------------------------------------------------------------


def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    top = ops.topk_per_group(
        joined,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return top.select(
        "c_mktsegment",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("rn").cast("int").alias("rn"),
    )


TOP_ORDERS_PER_SEGMENT_SQL = """
SELECT c_mktsegment, o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
       CAST(rn AS INTEGER) AS rn
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# §2.5 window functions: ranking + analytic (lag) + running frame aggregate,
# one shuffle on the partition key.
# ---------------------------------------------------------------------------


def customer_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("order_seq"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,10)")).over(running), 2
        )
        .cast("double")
        .alias("running_spend"),
        F.coalesce(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w)
            ),
            F.lit(-1),
        )
        .cast("int")
        .alias("days_since_prev"),
    )


CUSTOMER_ORDER_WINDOW_SQL = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS running_spend,
  CAST(COALESCE(date_diff('day',
      CAST(LAG(o_orderdate, 1) OVER w AS DATE),
      CAST(o_orderdate AS DATE)), -1) AS INTEGER) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# ---------------------------------------------------------------------------
# §2.7 set operations.
# ---------------------------------------------------------------------------


def high_value_open_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll: multiset difference — custkeys of high-value orders minus
    custkeys of fulfilled orders (bag semantics preserved)."""
    orders = load(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") > 300_000).select("o_custkey")
    fulfilled = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return high.exceptAll(fulfilled)


HIGH_VALUE_OPEN_CUSTKEYS_SQL = """
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def buyer_and_building_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect (distinct): customers in the BUILDING segment who actually
    placed an order."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    buyers = orders.select(F.col("o_custkey").alias("custkey"))
    return building.intersect(buyers)


BUYER_AND_BUILDING_CUSTKEYS_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders
"""


def nation_supplier_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct: nation keys present on either side."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).distinct()


NATION_SUPPLIER_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


# ---------------------------------------------------------------------------
# J2 (full/right outer): date spines that only partially overlap.
# Both inputs are pre-aggregated before the join, so the outer join runs on
# one row per date (~2.4k rows at any SF) — aggregate-then-join, never
# join-then-aggregate, is the shape that holds at 100 TB.
# ---------------------------------------------------------------------------


def daily_orders_vs_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of the per-day order count vs the per-day shipment
    count. Order dates and ship dates cover offset ranges (shipments trail
    orders), so both null sides are genuinely exercised."""
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    s = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_shipments"))
    )
    return (
        o.join(s, "d", "full")
        .select(
            "d",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_shipments", F.lit(0)).alias("n_shipments"),
        )
    )


DAILY_ORDERS_VS_SHIPMENTS_SQL = """
WITH o AS (
  SELECT o_orderdate AS d, COUNT(*) AS n_orders FROM orders GROUP BY 1
),
s AS (
  SELECT l_shipdate AS d, COUNT(*) AS n_shipments FROM lineitem GROUP BY 1
)
SELECT COALESCE(o.d, s.d) AS d,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(n_shipments, 0) AS n_shipments
FROM o FULL OUTER JOIN s ON o.d = s.d
"""


def nation_order_counts_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: orders ⟖ customer keeps every customer (orderless
    ones count 0), then rolls up to the nation grain."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_nationkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_join_rows"),
        )
    )


NATION_ORDER_COUNTS_RIGHT_SQL = """
SELECT c_nationkey,
       COUNT(o_orderkey) AS n_orders,
       COUNT(*) AS n_join_rows
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def customer_balance_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 completion: rank / dense_rank / ntile / lead (ranking+analytic
    over a deterministic tie-broken order) and a RANGE frame (value-based:
    sum of balances within 500.0 below the current balance). One shuffle
    on the partition key serves every window."""
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    # rank/dense_rank order by the HUNDREDS bucket so ties actually occur
    # and the gap/no-gap semantics are exercised (over a unique order both
    # would degenerate to row_number and the oracle check would be
    # vacuous); value-only ordering keeps them deterministic under ties
    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.round(F.col("c_acctbal"), -2).asc()
    )
    wr = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").asc())
        .rangeBetween(-500, Window.currentRow)
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(wt).cast("int").alias("bal_rank"),
        F.dense_rank().over(wt).cast("int").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("int").alias("bal_quartile"),
        F.round(F.lead("c_acctbal", 1).over(w), 2).alias("next_bal"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(38,10)")).over(wr), 2
        )
        .cast("double")
        .alias("nearby_bal_sum"),
    )


CUSTOMER_BALANCE_WINDOW_SQL = """
SELECT
  c_custkey,
  c_mktsegment,
  ROUND(c_acctbal, 2) AS acctbal,
  CAST(RANK() OVER wt AS INTEGER) AS bal_rank,
  CAST(DENSE_RANK() OVER wt AS INTEGER) AS bal_dense_rank,
  CAST(NTILE(4) OVER w AS INTEGER) AS bal_quartile,
  ROUND(LEAD(c_acctbal, 1) OVER w, 2) AS next_bal,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,10))) OVER (
    PARTITION BY c_mktsegment ORDER BY c_acctbal ASC
    RANGE BETWEEN 500 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS nearby_bal_sum
FROM customer
WHERE c_custkey < 500
WINDOW w AS (
  PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC),
wt AS (
  PARTITION BY c_mktsegment ORDER BY ROUND(c_acctbal, -2) ASC)
"""


def customer_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 tail: the distribution-analytic window functions —
    percent_rank / cume_dist (relative position within the partition),
    nth_value (2nd-lowest balance, frame-wide), and first/last over an
    explicit ROWS frame. Same single shuffle as customer_balance_window;
    shelved (pytest-hash-checked) — the driver slots stay with the
    curation/LLM operators."""
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.round(F.nth_value("c_acctbal", 2).over(wf), 2).alias(
            "second_lowest_bal"
        ),
        F.round(F.first("c_acctbal").over(wf), 2).alias("lowest_bal"),
        F.round(F.last("c_acctbal").over(wf), 2).alias("highest_bal"),
    )


CUSTOMER_BALANCE_DISTRIBUTION_SQL = """
SELECT
  c_custkey,
  c_mktsegment,
  ROUND(c_acctbal, 2) AS acctbal,
  ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
  ROUND(CUME_DIST() OVER w, 6) AS bal_cume_dist,
  ROUND(NTH_VALUE(c_acctbal, 2) OVER wf, 2) AS second_lowest_bal,
  ROUND(FIRST_VALUE(c_acctbal) OVER wf, 2) AS lowest_bal,
  ROUND(LAST_VALUE(c_acctbal) OVER wf, 2) AS highest_bal
FROM customer
WHERE c_custkey < 500
WINDOW w AS (
  PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC),
wf AS (
  PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# TPC-H-style classics on the fixture star schema: Q3 (shipping priority —
# selective join chain + grouped revenue + top-k) and Q6 (forecast revenue —
# pure filter/agg, the pushdown showcase).
# ---------------------------------------------------------------------------


def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 analog: top-10 open orders of BUILDING customers by outstanding
    revenue. Both date filters reach the scans (pushdown); customer is the
    broadcast dim; lineitem⋈orders shuffles once on the key; the final
    top-k is TakeOrderedAndProject."""
    cutoff = F.lit("1995-03-15").cast("timestamp")
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SHIPPING_PRIORITY_Q3_SQL = """
SELECT
  o_orderkey,
  o_orderdate,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2)
    AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 analog: one filtered scan, one global agg, zero joins — every
    predicate pushes into the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


FORECAST_REVENUE_Q6_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,10))), 2)
    AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "revenue_per_nation": revenue_per_nation,
    "customer_order_stats": customer_order_stats,
    "customers_without_big_orders": customers_without_big_orders,
    "parts_with_lineitems": parts_with_lineitems,
    "orders_price_band": orders_price_band,
    "region_nation_grid": region_nation_grid,
    "top_orders_by_price": top_orders_by_price,
    "top_orders_per_segment": top_orders_per_segment,
    "customer_order_window": customer_order_window,
    "high_value_open_custkeys": high_value_open_custkeys,
    "nation_supplier_union": nation_supplier_union,
    "daily_orders_vs_shipments": daily_orders_vs_shipments,
    "shipping_priority_q3": shipping_priority_q3,
    "forecast_revenue_q6": forecast_revenue_q6,
    "customer_balance_window": customer_balance_window,
}

# Oracle-verified in tests/test_queries_oracle.py but outside the external
# driver's 50-row budget: right-outer is the mirrored code path of the
# declared left-outer (customer_order_stats) and INTERSECT shares the
# §2.7 machinery with the declared UNION/EXCEPT rows — their slots went to
# the curation operators (queries/curation.py).
SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "buyer_and_building_custkeys": buyer_and_building_custkeys,
    "nation_order_counts_right": nation_order_counts_right,
    "customer_balance_distribution": customer_balance_distribution,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "buyer_and_building_custkeys": BUYER_AND_BUILDING_CUSTKEYS_SQL,
    "nation_order_counts_right": NATION_ORDER_COUNTS_RIGHT_SQL,
    "customer_balance_distribution": CUSTOMER_BALANCE_DISTRIBUTION_SQL,
}

ORACLE_SQL: dict[str, str] = {
    "revenue_per_nation": REVENUE_PER_NATION_SQL,
    "customer_order_stats": CUSTOMER_ORDER_STATS_SQL,
    "customers_without_big_orders": CUSTOMERS_WITHOUT_BIG_ORDERS_SQL,
    "parts_with_lineitems": PARTS_WITH_LINEITEMS_SQL,
    "orders_price_band": ORDERS_PRICE_BAND_SQL,
    "region_nation_grid": REGION_NATION_GRID_SQL,
    "top_orders_by_price": TOP_ORDERS_BY_PRICE_SQL,
    "top_orders_per_segment": TOP_ORDERS_PER_SEGMENT_SQL,
    "customer_order_window": CUSTOMER_ORDER_WINDOW_SQL,
    "high_value_open_custkeys": HIGH_VALUE_OPEN_CUSTKEYS_SQL,
    "nation_supplier_union": NATION_SUPPLIER_UNION_SQL,
    "daily_orders_vs_shipments": DAILY_ORDERS_VS_SHIPMENTS_SQL,
    "shipping_priority_q3": SHIPPING_PRIORITY_Q3_SQL,
    "forecast_revenue_q6": FORECAST_REVENUE_Q6_SQL,
    "customer_balance_window": CUSTOMER_BALANCE_WINDOW_SQL,
}


def shipments_in_order_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """J4's 100 TB spelling: point-in-interval join between two FACT-sized
    frames via `ops.banded_interval_join` — both sides banded on
    floor(epoch/14d) and equi-joined on the band with the BETWEEN as a
    residual, so the plan is a hash join Catalyst can shuffle/broadcast/
    skew-split (plan-gated: no BroadcastNestedLoopJoin, no
    CartesianProduct). The existing `orders_price_band` covers the
    literal-small-dim theta join; this covers the case where neither side
    is a literal. Every 1000th order opens a 14-day window from its order
    date; shipments (l_shipdate) falling inside are counted per window.
    The oracle spells the same join as a plain non-equi BETWEEN — band
    mechanics must be invisible in the result."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    windows = orders.filter(F.col("o_orderkey") % 1000 == 0).select(
        F.col("o_orderkey").alias("window_id"),
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")).alias("w_end"),
    )
    joined = ops.banded_interval_join(
        li.select("l_shipdate", "l_quantity"),
        windows,
        "l_shipdate",
        "w_start",
        "w_end",
        band_seconds=14 * 86400,
    )
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .select("window_id", "n_shipments", "sum_qty")
    )


SHIPMENTS_IN_ORDER_WINDOWS_SQL = """
SELECT o_orderkey AS window_id,
       COUNT(*) AS n_shipments,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE)
         AS sum_qty
FROM orders
JOIN lineitem
  ON l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 14 DAY
WHERE o_orderkey % 1000 = 0
GROUP BY o_orderkey
"""

SHELVED_QUERIES["shipments_in_order_windows"] = shipments_in_order_windows
SHELVED_ORACLE_SQL["shipments_in_order_windows"] = (
    SHIPMENTS_IN_ORDER_WINDOWS_SQL
)


def overlapping_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join at scale via
    `ops.banded_overlap_join`: every 100th order opens a 60-day window;
    report each overlapping window PAIR (smaller orderkey first) with its
    overlap length in days. Each qualifying pair is anchored to the band
    of the later start, so the banded plan emits it exactly once — the
    oracle spells the same join as the plain overlap predicate, and the
    band mechanics must be invisible in the result."""
    orders = load(spark, sf_dir, "orders")
    win = orders.filter(F.col("o_orderkey") % 100 == 0)
    a = win.select(
        F.col("o_orderkey").alias("a_id"),
        F.col("o_orderdate").alias("a_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("a_e"),
    )
    b = win.select(
        F.col("o_orderkey").alias("b_id"),
        F.col("o_orderdate").alias("b_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("b_e"),
    )
    pairs = ops.banded_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", band_seconds=60 * 86400
    ).filter(F.col("a_id") < F.col("b_id"))
    return pairs.select(
        "a_id",
        "b_id",
        F.datediff(
            F.least(F.col("a_e"), F.col("b_e")).cast("date"),
            F.greatest(F.col("a_s"), F.col("b_s")).cast("date"),
        ).alias("overlap_days"),
    )


OVERLAPPING_ORDER_WINDOWS_SQL = """
WITH w AS (
  SELECT o_orderkey AS id,
         o_orderdate AS s,
         o_orderdate + INTERVAL 60 DAY AS e
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT a.id AS a_id,
       b.id AS b_id,
       CAST(datediff('day',
            greatest(a.s, b.s), least(a.e, b.e)) AS INTEGER)
         AS overlap_days
FROM w a JOIN w b
  ON a.s <= b.e AND b.s <= a.e AND a.id < b.id
"""

SHELVED_QUERIES["overlapping_order_windows"] = overlapping_order_windows
SHELVED_ORACLE_SQL["overlapping_order_windows"] = (
    OVERLAPPING_ORDER_WINDOWS_SQL
)


def parts_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (frequent-itemset lite): the 20 part
    pairs most often ordered together, with co-order counts — the
    recommender/affinity workload every warehouse runs over its order
    lines.

    Scale shape: the pair explosion is WITHIN-order only — distinct
    (order, part) first, then a self-equi-join on the order key with
    the triangle cut in the join condition, so pair volume is bounded
    by Σ(items-per-order choose 2), never corpus²; both sides shuffle
    on the same order key (one co-partitioned exchange, AQE-skew-
    splittable for a pathological mega-order). The pair count is a
    map-side-combined groupBy, and the top-20 is TakeOrderedAndProject
    (count desc, pair asc tiebreak = deterministic under ties); only
    the 20 survivors enter the bounded rank window."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("part_a")
    )
    b = lp.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, (a["__ok"] == b["__ok"]) & (a["part_a"] < b["part_b"]))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    from pyspark.sql import Window

    top = pairs.orderBy(
        F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(20)
    w = Window.orderBy(
        F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    )
    return top.select(
        F.col("part_a").cast("bigint").alias("part_a"),
        F.col("part_b").cast("bigint").alias("part_b"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


PARTS_COPURCHASE_PAIRS_SQL = """
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS n_orders
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT CAST(part_a AS BIGINT) AS part_a,
       CAST(part_b AS BIGINT) AS part_b,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(ROW_NUMBER() OVER (
         ORDER BY n_orders DESC, part_a ASC, part_b ASC) AS INT) AS rank
FROM p
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
"""

SHELVED_QUERIES["parts_copurchase_pairs"] = parts_copurchase_pairs
SHELVED_ORACLE_SQL["parts_copurchase_pairs"] = PARTS_COPURCHASE_PAIRS_SQL


def parts_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (support / confidence /
    lift): the statistical completion of the market-basket family —
    `parts_copurchase_pairs` counts co-occurrence, this scores it. Top
    20 directed rules a→b by lift (co-order count ≥ 3 support floor).

    Scale shape: same bounded within-order pair explosion as the pair
    query (never corpus²); the per-item counts table is part-dimension
    sized and joins on the part key (broadcast here, shuffled hash join
    at catalog scale); the 1-row basket total broadcasts. Lift divides
    exact integer products, so rounding is engine-identical; only the
    ≤ 2×pairs rule table is ever sorted."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = lp.select(
        F.countDistinct("l_orderkey").alias("__n_orders")
    )  # 1 row — broadcast below
    item = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a = lp.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("pa")
    )
    b = lp.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, (a["__ok"] == b["__ok"]) & (a["pa"] < b["pb"]))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "n_ab",
        )
    )
    na = item.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    nb = item.select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_b")
    )
    scored = (
        rules.join(F.broadcast(na), "antecedent")
        .join(F.broadcast(nb), "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("antecedent").cast("bigint").alias("antecedent"),
            F.col("consequent").cast("bigint").alias("consequent"),
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.col("n_ab").cast("double") / F.col("__n_orders"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_a"), 6
            ).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("__n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("antecedent").asc(),
        F.col("consequent").asc(),
    ).limit(20)


PARTS_ASSOCIATION_RULES_SQL = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lp),
item AS (SELECT l_partkey, COUNT(*) AS n_item FROM lp GROUP BY 1),
pair AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
         FROM lp a JOIN lp b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2 HAVING COUNT(*) >= 3),
rules AS (SELECT pa AS antecedent, pb AS consequent, n_ab FROM pair
          UNION ALL
          SELECT pb, pa, n_ab FROM pair)
SELECT CAST(r.antecedent AS BIGINT) AS antecedent,
       CAST(r.consequent AS BIGINT) AS consequent,
       CAST(r.n_ab AS BIGINT) AS n_ab,
       ROUND(CAST(r.n_ab AS DOUBLE) / n.n_orders, 6) AS support,
       ROUND(CAST(r.n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
       ROUND(CAST(r.n_ab * n.n_orders AS DOUBLE)
             / (ia.n_item * ic.n_item), 6) AS lift
FROM rules r
JOIN item ia ON ia.l_partkey = r.antecedent
JOIN item ic ON ic.l_partkey = r.consequent
CROSS JOIN n
ORDER BY lift DESC, antecedent ASC, consequent ASC
LIMIT 20
"""

SHELVED_QUERIES["parts_association_rules"] = parts_association_rules
SHELVED_ORACLE_SQL["parts_association_rules"] = PARTS_ASSOCIATION_RULES_SQL
