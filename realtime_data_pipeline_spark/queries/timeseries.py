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


def orders_daily_revenue_acf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sample autocorrelation of daily order revenue at lags 1-7
    (round-16 build) — the seasonality screen a forecasting pipeline
    runs before choosing features (a weekly cycle shows as a lag-7
    spike): ``acf_k = Σ(r_t−μ)(r_{t+k}−μ) / Σ(r_t−μ)²`` over the
    OBSERVED daily series in row order (gap days collapse; the
    gap-filled variant composes with events_hourly_ffill's
    calendar-spine idiom). Scale shape: the data-sized work is ONE
    daily pre-aggregate (map-side combined, DECIMAL-exact revenue per
    day); the LEAD window and the moment aggregate run over the
    ≤-calendar-days series — bounded by the calendar, never the fact
    table (the χ²-face bounded-window stance). The acf ratio is
    double arithmetic rounded at 1e-6 (sum order is engine-dependent;
    the grid absorbs it, the repo's standing double-agg policy)."""
    from pyspark.sql.window import Window as W

    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("rev")
        )
    )
    w = W.partitionBy().orderBy("day")
    lead_cols = [
        F.lead("rev", k).over(w).alias(f"__l{k}") for k in range(1, 8)
    ]
    led = daily.select("rev", *lead_cols)
    stats = led.agg(
        F.avg("rev").alias("__mu"),
        F.sum(F.col("rev") * F.col("rev")).alias("__s2"),
        F.sum("rev").alias("__s1"),
        F.count(F.lit(1)).alias("__n"),
    )
    ss = F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("__n")
    acfs = led.crossJoin(F.broadcast(stats)).agg(
        *[
            F.sum(
                (F.col("rev") - F.col("__mu"))
                * (F.col(f"__l{k}") - F.col("__mu"))
            ).alias(f"__num{k}")
            for k in range(1, 8)
        ],
        *[
            F.count(F.col(f"__l{k}")).alias(f"__np{k}")
            for k in range(1, 8)
        ],
        F.first(ss).alias("__ss"),
    )
    pairs = ", ".join(
        f"{k}, __np{k}, CAST(__num{k} / __ss AS DOUBLE)"
        for k in range(1, 8)
    )
    return (
        acfs.selectExpr(
            f"stack(7, {pairs}) AS (lag, n_pairs, __acf)"
        )
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.round("__acf", 6).alias("acf"),
        )
        .orderBy("lag")
    )


ORDERS_DAILY_REVENUE_ACF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS rev
  FROM orders GROUP BY day
), led AS (
  SELECT rev,
         LEAD(rev, 1) OVER (ORDER BY day) AS l1,
         LEAD(rev, 2) OVER (ORDER BY day) AS l2,
         LEAD(rev, 3) OVER (ORDER BY day) AS l3,
         LEAD(rev, 4) OVER (ORDER BY day) AS l4,
         LEAD(rev, 5) OVER (ORDER BY day) AS l5,
         LEAD(rev, 6) OVER (ORDER BY day) AS l6,
         LEAD(rev, 7) OVER (ORDER BY day) AS l7
  FROM daily
), stats AS (
  SELECT AVG(rev) AS mu,
         SUM(rev * rev) - SUM(rev) * SUM(rev) / COUNT(*) AS ss
  FROM led
), agg AS (
  SELECT
    SUM((rev - mu) * (l1 - mu)) AS num1, COUNT(l1) AS np1,
    SUM((rev - mu) * (l2 - mu)) AS num2, COUNT(l2) AS np2,
    SUM((rev - mu) * (l3 - mu)) AS num3, COUNT(l3) AS np3,
    SUM((rev - mu) * (l4 - mu)) AS num4, COUNT(l4) AS np4,
    SUM((rev - mu) * (l5 - mu)) AS num5, COUNT(l5) AS np5,
    SUM((rev - mu) * (l6 - mu)) AS num6, COUNT(l6) AS np6,
    SUM((rev - mu) * (l7 - mu)) AS num7, COUNT(l7) AS np7,
    ANY_VALUE(ss) AS ss
  FROM led CROSS JOIN stats
)
SELECT lag, n_pairs, acf FROM (
  SELECT 1 AS lag, CAST(np1 AS BIGINT) AS n_pairs,
         ROUND(CAST(num1 / ss AS DOUBLE), 6) AS acf FROM agg
  UNION ALL SELECT 2, CAST(np2 AS BIGINT),
         ROUND(CAST(num2 / ss AS DOUBLE), 6) FROM agg
  UNION ALL SELECT 3, CAST(np3 AS BIGINT),
         ROUND(CAST(num3 / ss AS DOUBLE), 6) FROM agg
  UNION ALL SELECT 4, CAST(np4 AS BIGINT),
         ROUND(CAST(num4 / ss AS DOUBLE), 6) FROM agg
  UNION ALL SELECT 5, CAST(np5 AS BIGINT),
         ROUND(CAST(num5 / ss AS DOUBLE), 6) FROM agg
  UNION ALL SELECT 6, CAST(np6 AS BIGINT),
         ROUND(CAST(num6 / ss AS DOUBLE), 6) FROM agg
  UNION ALL SELECT 7, CAST(np7 AS BIGINT),
         ROUND(CAST(num7 / ss AS DOUBLE), 6) FROM agg
)
ORDER BY lag
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_hourly_ffill": events_hourly_ffill,
    "events_rolling_1h_stats": events_rolling_1h_stats,
    "events_dau_wau": events_dau_wau,
    # round-16 build: lag-1..7 sample autocorrelation (seasonality)
    "orders_daily_revenue_acf": orders_daily_revenue_acf,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "orders_daily_revenue_acf": ORDERS_DAILY_REVENUE_ACF_SQL,
    "events_hourly_ffill": EVENTS_HOURLY_FFILL_SQL,
    "events_rolling_1h_stats": EVENTS_ROLLING_1H_STATS_SQL,
    "events_dau_wau": EVENTS_DAU_WAU_SQL,
}
