"""P8: the standard scalar function surface (string / date / math /
conditional / array), oracle-checked in one wide projection, plus the A6
histogram. SURVEY.md §2.2.

Cross-engine traps handled here (documented for every future query):
* Spark ``dayofweek`` is 1=Sunday, DuckDB 0=Sunday → +1 on the oracle;
* Spark ``log`` is natural log = DuckDB ``ln``; transcendentals rounded
  to 6 decimals (libm last-ulp differences are ~1e-14 relative);
* Spark ``split`` takes a regex, DuckDB ``string_split`` a literal;
* array indexing: ``getItem(0)`` vs 1-based ``list[1]``.

All of it is one narrow projection — zero shuffles; the histogram is one
hash aggregation on a derived bucket key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.queries.core import load
from realtime_data_pipeline_spark.queries.util import dsum


def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    prio_parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        # string
        F.lower("o_orderstatus").alias("status_lower"),
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_code"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("tag"),
        prio_parts.getItem(0).alias("prio_rank"),
        F.size(prio_parts).cast("int").alias("prio_parts"),
        F.array_contains(prio_parts, "URGENT").alias("is_urgent"),
        # date
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_sun1"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        # math
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("o_totalprice") / 100000.0, 2), 6).alias("price_pow2"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.ceil("o_totalprice").cast("bigint").alias("price_ceil"),
        F.round(F.abs(F.col("o_totalprice") - 150000.0), 2).alias("abs_diff"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        # conditional
        F.when(F.col("o_totalprice") > 200000, F.lit("big"))
        .when(F.col("o_totalprice") > 100000, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
    )


SCALAR_FUNCTIONS_SHOWCASE_SQL = """
SELECT
  o_orderkey,
  lower(o_orderstatus) AS status_lower,
  upper(substring(o_orderpriority, 1, 1)) AS prio_code,
  CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
  concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
  string_split(o_orderpriority, '-')[1] AS prio_rank,
  CAST(len(string_split(o_orderpriority, '-')) AS INTEGER) AS prio_parts,
  list_contains(string_split(o_orderpriority, '-'), 'URGENT') AS is_urgent,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(month(o_orderdate) AS INTEGER) AS o_month,
  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
    AS INTEGER) AS days_since_95,
  ROUND(ln(o_totalprice), 6) AS price_ln,
  ROUND(pow(o_totalprice / 100000.0, 2), 6) AS price_pow2,
  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
  ROUND(abs(o_totalprice - 150000.0), 2) AS abs_diff,
  ROUND(sqrt(o_totalprice), 6) AS price_sqrt,
  CASE WHEN o_totalprice > 200000 THEN 'big'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'small' END AS price_band,
  COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open
FROM orders
"""


def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: equi-width histogram as a derived-bucket hash aggregation —
    one shuffle of (bucket, partials), the 100 TB histogram shape."""
    o = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50_000).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            dsum(F.col("o_totalprice")).alias("bucket_total"),
        )
    )


ORDERS_PRICE_HISTOGRAM_SQL = """
SELECT
  CAST(floor(o_totalprice / 50000) AS INTEGER) AS bucket,
  COUNT(*) AS n_orders,
  ROUND(MIN(o_totalprice), 2) AS lo,
  ROUND(MAX(o_totalprice), 2) AS hi,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DOUBLE)
    AS bucket_total
FROM orders
GROUP BY 1
"""


def orders_price_histogram_equidepth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A6 twin of the equi-width histogram: EQUI-DEPTH (each bucket holds
    ~10 % of rows), the histogram shape an optimizer or drift monitor
    wants when the distribution is skewed — equal-width buckets would
    put 90 % of a lognormal in one bar. Boundaries are the exact deciles
    from ONE percentile aggregate (1 row, broadcast back — never a
    global sort/ntile, which funnels the table through one task);
    bucket assignment is 9 strict `>` comparisons so a value exactly ON
    a boundary bins identically in both engines; then a plain hash
    aggregation. Two scans, two 1-row shuffles, fully distributed."""
    o = load(spark, sf_dir, "orders")
    b = o.agg(
        *[
            F.percentile(F.col("o_totalprice"), F.lit(i / 10.0)).alias(
                f"__b{i}"
            )
            for i in range(1, 10)
        ]
    )
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + F.when(
            F.col("o_totalprice") > F.col(f"__b{i}"), 1
        ).otherwise(0)
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


ORDERS_PRICE_HISTOGRAM_EQUIDEPTH_SQL = """
WITH q AS (
  SELECT quantile_cont(o_totalprice, 0.1) AS b1,
         quantile_cont(o_totalprice, 0.2) AS b2,
         quantile_cont(o_totalprice, 0.3) AS b3,
         quantile_cont(o_totalprice, 0.4) AS b4,
         quantile_cont(o_totalprice, 0.5) AS b5,
         quantile_cont(o_totalprice, 0.6) AS b6,
         quantile_cont(o_totalprice, 0.7) AS b7,
         quantile_cont(o_totalprice, 0.8) AS b8,
         quantile_cont(o_totalprice, 0.9) AS b9
  FROM orders
)
SELECT CAST(1 + (CASE WHEN o_totalprice > b1 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b2 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b3 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b4 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b5 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b6 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b7 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b8 THEN 1 ELSE 0 END)
              + (CASE WHEN o_totalprice > b9 THEN 1 ELSE 0 END)
       AS INT) AS bucket,
       COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM orders CROSS JOIN q
GROUP BY 1
ORDER BY bucket
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "scalar_functions_showcase": scalar_functions_showcase,
    "orders_price_histogram": orders_price_histogram,
}

ORACLE_SQL: dict[str, str] = {
    "scalar_functions_showcase": SCALAR_FUNCTIONS_SHOWCASE_SQL,
    "orders_price_histogram": ORDERS_PRICE_HISTOGRAM_SQL,
}

SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # round-11 build: exact-decile equi-depth histogram
    "orders_price_histogram_equidepth": orders_price_histogram_equidepth,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "orders_price_histogram_equidepth": ORDERS_PRICE_HISTOGRAM_EQUIDEPTH_SQL,
}
