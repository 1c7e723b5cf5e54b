"""Declared query inventory — the driver-checked operator surface.

Every function here takes ``(spark, sf_dir)`` and returns a DataFrame; each
has a DuckDB-oracle twin in ``ORACLE_SQL`` (same result column names — the
driver hash-compares sorted columns). Together they cover the operator
inventory in SURVEY.md §2.

Query style rules (oracle parity, SURVEY.md §5):
* alias every computed column identically in Spark and SQL;
* deterministic ORDER-less results (driver compares order-insensitively) but
  deterministic *content*: no current_timestamp, no approx unless rows-only;
* timestamps compared under UTC (session TZ pinned by the driver/session);
* doubles that aggregate in engine-dependent order are rounded on BOTH sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import dq
from realtime_data_pipeline_spark.queries.util import davg, dsum


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """S1: parquet scan with footer-inferred schema
    (parity: ``spark_jobs/batch_etl.py:38``)."""
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# Flagship: single-pass DQ conditional aggregation (A2) + grouped agg (A3).
# Rewrites the reference's 4-scan DQ loop (spark_jobs/dq_checks.py:56-59)
# as ONE scan with per-group violation counts AND revenue.
# ---------------------------------------------------------------------------


def dq_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rules = dq.lineitem_rules()
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    ]
    for rule in rules:
        aggs.append(
            F.sum(F.when(rule.predicate, F.lit(1)).otherwise(F.lit(0))).alias(rule.name)
        )
    return li.groupBy("l_returnflag").agg(*aggs)


DQ_PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  COUNT(*) AS n_rows,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2)
    AS DOUBLE) AS revenue,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_qty,
  CAST(SUM(CASE WHEN l_extendedprice < 0 OR l_extendedprice IS NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS neg_or_null_price,
  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS bad_discount,
  CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS outlier_quantity,
  CAST(SUM(CASE WHEN l_tax < 0 OR l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS neg_or_null_tax
FROM lineitem
GROUP BY l_returnflag
"""


def dq_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 in its pure form: whole-table single-pass rule evaluation."""
    li = load(spark, sf_dir, "lineitem")
    return dq.violation_counts_df(li, dq.lineitem_rules())


DQ_VIOLATION_COUNTS_SQL = """
SELECT
  COUNT(*) AS total_rows,
  CAST(SUM(CASE WHEN l_extendedprice < 0 OR l_extendedprice IS NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS neg_or_null_price,
  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS bad_discount,
  CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS outlier_quantity,
  CAST(SUM(CASE WHEN l_tax < 0 OR l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS neg_or_null_tax
FROM lineitem
"""


def pricing_summary_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: TPC-H Q1-style pricing summary (groupBy two keys, many aggs).
    Hash-agg with automatic partial aggregation; the canonical headline
    grouped-aggregation benchmark query."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE)
    AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2)
    AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
    AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 4)
    AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 4)
    AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6)
    AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Registry — __spark_entry__ re-exports these.
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_pricing_summary": dq_pricing_summary,
    "dq_violation_counts": dq_violation_counts,
    "pricing_summary_q1": pricing_summary_q1,
}

ORACLE_SQL: dict[str, str] = {
    "dq_pricing_summary": DQ_PRICING_SUMMARY_SQL,
    "dq_violation_counts": DQ_VIOLATION_COUNTS_SQL,
    "pricing_summary_q1": PRICING_SUMMARY_Q1_SQL,
}
