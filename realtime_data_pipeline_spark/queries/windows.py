"""Batch twins of the streaming window operators (W3/W4), oracle-checked.

``F.window`` / ``F.session_window`` / the sessionize window-cumsum all run
identically on batch DataFrames — declaring them here gives the driver a
hash-verifiable statement of the streaming operators' event-time semantics
(the streaming-only parts — watermarks, state, triggers — are covered by
``tests/test_streaming.py``; no SQL oracle can express them).

Session boundary convention (both engines): an event starts a NEW session
when ``ts - prev_ts >= gap`` (Spark session windows are [start, end) with
end = last + gap, so a gap of exactly ``gap`` does not extend).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from realtime_data_pipeline_spark import ops, streaming
from realtime_data_pipeline_spark.queries.llm import load_events

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    counts = streaming.tumbling_counts(ev, "ts", "5 minutes", keys=["event_type"])
    return counts.select(
        F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
        "event_type",
        "n_events",
    )


EVENTS_TUMBLING_5MIN_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '{TS_FMT_DUCK}')
         AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows = each event contributes to width/slide windows; the
    oracle expresses that as a union of two phase-shifted tumbling grids."""
    ev = load_events(spark, sf_dir)
    counts = streaming.tumbling_counts(
        ev, "ts", "10 minutes", keys=["event_type"], slide="5 minutes"
    )
    return counts.select(
        F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
        "event_type",
        "n_events",
    )


EVENTS_SLIDING_10M_5M_SQL = f"""
WITH both_grids AS (
  SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
         event_type
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '10 minutes', ts, INTERVAL '5 minutes')
           AS window_start,
         event_type
  FROM events
)
SELECT strftime(window_start, '{TS_FMT_DUCK}') AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM both_grids
GROUP BY 1, 2
"""


def events_sessions_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 batch twin: gap-merged sessions per user via F.session_window."""
    ev = load_events(spark, sf_dir)
    sess = streaming.session_aggregate(ev, "ts", "30 minutes", ["user_id"])
    return sess.select(
        "user_id",
        F.date_format(F.col("s.start"), TS_FMT).alias("session_start"),
        "n_events",
    )


EVENTS_SESSIONS_30M_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, sid
"""


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row session ids (ops.sessionize — window + cumsum, one shuffle
    on the key); the row-level view the aggregate above collapses."""
    ev = load_events(spark, sf_dir)
    out = ops.sessionize(ev, "user_id", "ts", 30, order_tiebreak="event_id")
    return out.select(
        "event_id", "user_id", F.col("session_id").cast("int").alias("session_id")
    )


EVENTS_SESSIONIZED_SQL = """
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
FROM flagged
"""


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis over 30-minute sessions: the 20 most common ordered
    event-type journeys (``view>click>purchase``-style strings). One
    extra shuffle beyond sessionize — per-session ordered collect (the
    journey string), then a count over journey strings. The per-session
    state is that session's events, the same bound sessionization
    carries."""
    ev = load_events(spark, sf_dir)
    sess = ops.sessionize(ev, "user_id", "ts", 30, order_tiebreak="event_id")
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    # distributed top-k FIRST (TakeOrderedAndProject over the path
    # counts), THEN rank the <= 20 survivors — ranking the full distinct
    # path table through topk_per_group's constant-group window would
    # funnel every path through one task; this way the single-partition
    # window only ever sees the bounded result
    top = paths.orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    ).limit(20)
    w = W.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return top.select(
        "path",
        "n_sessions",
        F.row_number().over(w).cast("int").alias("rank"),
    )


EVENTS_TOP_PATHS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), paths AS (
  SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_id
), counted AS (
  SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path, n_sessions,
       CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS INT)
         AS rank
FROM counted
ORDER BY rank
LIMIT 20
"""


def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each (from_type, to_type) adjacent pair, the transition count
    and the row-normalized probability — the clickstream 'what happens
    next' model every product-analytics stack ships.

    One shuffle on user_id for the lead() window (ts, event_id
    tie-break = deterministic); the transition table it feeds is
    bounded at n_types² rows, so the normalizing sum-over-from_type
    window runs on that tiny aggregate, never on the events."""
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    row_total = F.sum("n_trans").over(W.partitionBy("from_type"))
    return (
        trans.select(
            "from_type",
            "to_type",
            F.col("n_trans").cast("bigint").alias("n_trans"),
            F.round(
                F.col("n_trans").cast("double") / row_total, 6
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


EVENTS_TYPE_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n_trans,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY from_type), 6) AS p
FROM s WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_tumbling_5min": events_tumbling_5min,
    "events_sliding_10m_5m": events_sliding_10m_5m,
    "events_sessions_30m": events_sessions_30m,
    "events_sessionized": events_sessionized,
}

SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_top_paths": events_top_paths,
    "events_type_transitions": events_type_transitions,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "events_top_paths": EVENTS_TOP_PATHS_SQL,
    "events_type_transitions": EVENTS_TYPE_TRANSITIONS_SQL,
}

ORACLE_SQL: dict[str, str] = {
    "events_tumbling_5min": EVENTS_TUMBLING_5MIN_SQL,
    "events_sliding_10m_5m": EVENTS_SLIDING_10M_5M_SQL,
    "events_sessions_30m": EVENTS_SESSIONS_30M_SQL,
    "events_sessionized": EVENTS_SESSIONIZED_SQL,
}
