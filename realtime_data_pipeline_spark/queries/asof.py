"""J5: as-of join, oracle-checked against DuckDB's native ASOF JOIN.

Spark has no as-of join operator; ``ops.asof_join`` implements the
one-shuffle union + ordered-window carry-forward pattern (see its
docstring for why that beats a range join at scale). This query attaches
the most recent prior ``purchase`` value to every ``click`` event per
user — the canonical streaming-enrichment shape, run in batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import ops
from realtime_data_pipeline_spark.queries.llm import load_events


def clicks_with_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # deterministic right side: one row per (user, ts) — max purchase value
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = ops.asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("purchase_value_asof").alias("last_purchase_value"),
    )


CLICKS_WITH_LAST_PURCHASE_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, p.purchase_value AS last_purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def clicks_with_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of (J5, direction='forward'): attach the EARLIEST purchase
    at-or-after each click per user — the attribution/conversion-lag shape.
    Same one-shuffle union + carry window as backward, run over descending
    ts. Oracle: DuckDB ``ASOF LEFT JOIN ... ON c.ts <= p.ts``."""
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = ops.asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["purchase_value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("purchase_value_asof").alias("next_purchase_value"),
    )


CLICKS_WITH_NEXT_PURCHASE_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, p.purchase_value AS next_purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts <= p.ts
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "clicks_with_last_purchase": clicks_with_last_purchase,
    "clicks_with_next_purchase": clicks_with_next_purchase,
}

ORACLE_SQL: dict[str, str] = {
    "clicks_with_last_purchase": CLICKS_WITH_LAST_PURCHASE_SQL,
    "clicks_with_next_purchase": CLICKS_WITH_NEXT_PURCHASE_SQL,
}
