"""Time-series shapes: gap-fill resampling (regularize an irregular event
stream onto a fixed grid with forward-fill) and rolling time-range window
aggregates — the hypertable-style operations a metrics/feature pipeline
runs over the events table.

Scale notes:

* Gap-fill generates each key's grid with ``sequence()`` + ``explode`` —
  the grid is born distributed (one row per key expands executor-side;
  no driver-side range loop, no cross join against a calendar table).
  The forward-fill is ``last(value, ignorenulls=True)`` over an
  unbounded-preceding ROWS frame: ONE window shuffle on the key serves
  the fill; the hourly-last pre-aggregation shares the same key
  partitioning. Grid density is bounded per key (span/step), so output
  scales with keys × span — the same as any resampler — and never with
  pairwise combinations.
* The rolling sum uses a value-based RANGE frame over epoch seconds —
  Spark evaluates it in one pass over each key's sorted run (no
  self-join against a time band, which is the quadratic spelling).
  Summed terms are decimal-quantized so the rolling totals are
  engine-exact at every row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.ops import epoch_seconds
from realtime_data_pipeline_spark.queries.core import load
from realtime_data_pipeline_spark.queries.util import DEC


def events_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with forward-fill: one row per user per
    hour of that user's active span; ``value`` carries the last
    observation at or before the hour (NULL only before the first
    observation, which the span construction excludes). The within-hour
    winner is the latest event (event_id tiebreak), picked by the same
    row_number spelling on both engines."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", "ts", "value", "event_id")
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
    )
    # last observation within each (user, hour)
    w_hr = Window.partitionBy("user_id", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        ev.withColumn("__rn", F.row_number().over(w_hr))
        .filter(F.col("__rn") == 1)
        .select("user_id", "hour", F.col("value").alias("obs_value"))
    )
    # per-user hourly grid across the active span, generated distributed
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn(
            "value", F.last("obs_value", ignorenulls=True).over(w_fill)
        )
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.round("value", 4).alias("value"),
            F.col("obs_value").isNotNull().alias("observed"),
        )
        .orderBy("user_id", "hour")
    )


EVENTS_HOURLY_FFILL_SQL = """
WITH ev AS (
  SELECT user_id, ts, value, event_id, DATE_TRUNC('hour', ts) AS hour
  FROM events WHERE user_id < 10
),
hourly AS (
  SELECT user_id, hour, value AS obs_value
  FROM (
    SELECT user_id, hour, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, hour
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev
  ) WHERE rn = 1
),
grid AS (
  SELECT user_id,
         UNNEST(generate_series(DATE_TRUNC('hour', MIN(ts)),
                                DATE_TRUNC('hour', MAX(ts)),
                                INTERVAL 1 HOUR)) AS hour
  FROM ev GROUP BY user_id
)
SELECT grid.user_id,
       STRFTIME(grid.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       ROUND(LAST_VALUE(obs_value IGNORE NULLS) OVER (
         PARTITION BY grid.user_id ORDER BY grid.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value,
       obs_value IS NOT NULL AS observed
FROM grid LEFT JOIN hourly
  ON grid.user_id = hourly.user_id AND grid.hour = hourly.hour
ORDER BY grid.user_id, grid.hour
"""


def events_rolling_1h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity: for every event, the sum and
    count of the same user's events in the preceding 3600 seconds
    (inclusive). A value-based RANGE frame over epoch seconds — one pass
    per sorted key run, never a banded self-join. Decimal-quantized
    terms keep every rolling total engine-exact."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            epoch_seconds(F.col("ts")).alias("sec"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast(DEC)).over(w), 4)
        .cast("double")
        .alias("rolling_sum_1h"),
        F.count(F.lit(1)).over(w).alias("rolling_n_1h"),
    ).orderBy("user_id", "event_id")


EVENTS_ROLLING_1H_STATS_SQL = """
SELECT event_id, user_id,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE)
         AS rolling_sum_1h,
       COUNT(*) OVER w AS rolling_n_1h
FROM (SELECT event_id, user_id, EPOCH(ts) AS sec, value
      FROM events WHERE user_id < 10)
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def events_dau_wau(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """DAU/WAU stickiness per day: daily active users, trailing-7-day
    active users, and their ratio — the engagement metric every product
    dashboard leads with, and a shape engines get wrong at scale
    because COUNT(DISTINCT) over a sliding RANGE window is either
    unsupported or a per-row set rebuild.

    Scale spelling: dedup to (day, user) pairs first (one shuffle,
    map-side combined), then each pair CONTRIBUTES FORWARD to the 7
    target days it covers via a constant-factor ``sequence()`` explode
    — the sliding distinct becomes a plain groupBy count-distinct over
    7×|day-user pairs| rows, no window at all (plan-gated). Cost is
    linear in active pairs, never days × full-history rescan.

    SCALING RULE (measured in bench --scale-ramp's window-width leg):
    the contribute-forward explode costs rows × ``window_days``, so cost
    grows LINEARLY in the window width. 7 days is cheap; at 30/90-day
    windows (MAU and beyond) the documented answer is the streaming HLL
    twin (`streaming.sliding_distinct_hll`) whose state is constant-size
    sketches per day instead of exploded rows — see SCALE.md."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = du.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(window_days - 1))
        ).alias("__off"),
        "day",
        "user_id",
    ).select(
        F.date_add(F.col("day"), F.col("__off")).alias("day"), "user_id"
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")  # inner: keep only observed days
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(
                F.col("dau").cast("double") / F.col("wau"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


EVENTS_DAU_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM du GROUP BY day
), contrib AS (
  SELECT du.day + g.off * INTERVAL 1 DAY AS day, du.user_id
  FROM du, generate_series(0, 6) g(off)
), wau AS (
  SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY day
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY day
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_hourly_ffill": events_hourly_ffill,
    "events_rolling_1h_stats": events_rolling_1h_stats,
    "events_dau_wau": events_dau_wau,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "events_hourly_ffill": EVENTS_HOURLY_FFILL_SQL,
    "events_rolling_1h_stats": EVENTS_ROLLING_1H_STATS_SQL,
    "events_dau_wau": EVENTS_DAU_WAU_SQL,
}
