"""Training-feature shapes: grouped anomaly scoring and recency-weighted
(time-decay) aggregates — the feature-engineering ops a model-training
pipeline runs over the event stream before labels ever exist.

Scale notes:

* The z-score pass aggregates group moments (exact DECIMAL Σx/Σx²) and
  BROADCASTS the tiny moments table back over the facts — the facts never
  shuffle (plan-gated; the window spelling would hash the whole table
  into |groups| partitions). The score is a pure function of the group's
  value multiset — order-independent and engine-identical; the flag
  predicate can't flip on a last-ulp, and degenerate groups (singleton /
  zero variance) are guarded to NULL so NaN-orders-above-everything
  semantics can't mark them all anomalous.
* Recency weighting uses a FIXED reference time, so the decay exponent is
  always ≤ 0 (no overflow at any data age) and the whole feature is one
  narrow projection + one aggregation shuffle. A per-row running EMA
  (e_i = αv_i + (1-α)e_{i-1}) deliberately does NOT ship as a window
  spelling: the closed form needs exp(+λt) prefix products that overflow
  at real time spans — at 100 TB that shape belongs to
  ``applyInPandasWithState`` (streaming) or a fixed-reference feature like
  this one.
* Per-term decimal(38,6) quantization of the decay terms before summing:
  double ``exp`` may differ by 1 ulp (~1e-16 relative) across engines;
  a 1e-6 grid absorbs it, and the decimal SUM is then exact on both
  sides (same policy as queries/util.py, one notch coarser because the
  inputs are transcendental).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.ops import epoch_seconds
from realtime_data_pipeline_spark.queries.core import load
from realtime_data_pipeline_spark.queries.util import DEC


def orders_price_anomalies_zscore(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Orders whose total price is an outlier (|z| > 2.5) within their
    order-priority group. Group moments (exact decimal Σx/Σx²) are a
    grouped aggregation — map-side partials, a few rows moved — then
    BROADCAST back over the facts: the fact table itself never
    shuffles. The window spelling (moments OVER (PARTITION BY group))
    would hash the whole table into |groups| partitions — with 5 groups
    at 100 TB that is 5 executors holding everything; plan-gated against
    regression to it."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    x = F.col("o_totalprice").cast(DEC)
    # the square is a double*double (IEEE-exact-rounded, engine-identical)
    # quantized to decimal BEFORE summing — a decimal*decimal product
    # would hit precision-overflow rules that differ between engines
    x2 = (F.col("o_totalprice") * F.col("o_totalprice")).cast(DEC)
    moments = orders.groupBy(
        F.col("o_orderpriority").alias("g")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x2).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    # degenerate groups must yield NO anomalies: a singleton's 0/(n-1)
    # is a hard DIVIDE_BY_ZERO under ANSI mode (not NaN), and an
    # all-equal group's var=0 would make z NaN — which both engines
    # order ABOVE every number, so abs(z) > 2.5 would flag the whole
    # group and the oracle could never catch it. Guard n>1 before the
    # divide and var>0 before the sqrt; NULL z fails the predicate on
    # both engines.
    var = F.when(
        F.col("n") > 1,
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1),
    )
    z = F.when(
        var > 0, (F.col("o_totalprice") - mean) / F.sqrt(var)
    )
    return (
        orders.join(
            F.broadcast(moments), F.col("o_orderpriority") == F.col("g")
        )
        .withColumn("z", F.round(z, 4))
        .filter(F.abs(F.col("z")) > 2.5)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("totalprice"),
            "z",
        )
        .orderBy("o_orderkey")
    )


ORDERS_PRICE_ANOMALIES_ZSCORE_SQL = """
WITH scored AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         COUNT(*) OVER w AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,10)))
              OVER w AS DOUBLE) AS sxx
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority)
)
SELECT o_orderkey, o_orderpriority,
       ROUND(o_totalprice, 2) AS totalprice,
       ROUND((o_totalprice - sx / n)
             / SQRT((sxx - sx * sx / n) / (n - 1)), 4) AS z
FROM scored
WHERE n > 1
  AND (sxx - sx * sx / n) / (n - 1) > 0
  AND ABS(ROUND((o_totalprice - sx / n)
          / SQRT((sxx - sx * sx / n) / (n - 1)), 4)) > 2.5
ORDER BY o_orderkey
"""


def customer_spend_anomalies_zscore(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customers whose TOTAL spend is an outlier (|z| > 2.5) within
    their market segment. Unlike the per-order variant (whose uniform
    fixture price can never exceed |z| = √3 ≈ 1.73 — structurally empty
    on this data), a customer's spend is a sum over a varying order
    count, so the fixture has genuine tail mass at every SF.

    Scale shape: the ``spend`` subtree (orders scan → custkey groupBy →
    broadcast customer join) appears under BOTH the moments aggregate
    and the probe side, but AQE's exchange reuse dedupes the identical
    custkey shuffle at runtime (executed plan shows ReusedExchange —
    pin: tests/test_plans.py::test_customer_spend_zscore_reuses_fact_exchange),
    so the facts shuffle ONCE; the 5-row segment-moments table
    broadcasts back and the z filter is a projection. Exact-decimal
    Σx/Σx² keeps both the spend sums and the moments engine-identical,
    so the anomaly flag can't flip on a last-ulp (same recipe as
    :func:`orders_price_anomalies_zscore`)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("spend")
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_custkey").alias("custkey"),
            "spend",
        )
    )
    moments = spend.groupBy("mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("spend").cast(DEC)).cast("double").alias("sx"),
        F.sum((F.col("spend") * F.col("spend")).cast(DEC))
        .cast("double")
        .alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = F.when(
        F.col("n") > 1,
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1),
    )
    z = F.when(var > 0, (F.col("spend") - mean) / F.sqrt(var))
    return (
        spend.join(F.broadcast(moments), "mktsegment")
        .withColumn("z", F.round(z, 4))
        .filter(F.abs(F.col("z")) > 2.5)
        .select(
            "custkey",
            "mktsegment",
            F.round("spend", 2).alias("spend"),
            "z",
        )
        .orderBy("custkey")
    )


CUSTOMER_SPEND_ANOMALIES_ZSCORE_SQL = """
WITH spend AS (
  SELECT c.c_mktsegment AS mktsegment, o.o_custkey AS custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS spend
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
m AS (
  SELECT mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(spend AS DECIMAL(38,10))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(spend * spend AS DECIMAL(38,10))) AS DOUBLE) AS sxx
  FROM spend GROUP BY mktsegment
)
SELECT custkey, mktsegment, ROUND(spend, 2) AS spend,
       ROUND((spend - sx / n)
             / SQRT((sxx - sx * sx / n) / (n - 1)), 4) AS z
FROM spend JOIN m USING (mktsegment)
WHERE n > 1
  AND (sxx - sx * sx / n) / (n - 1) > 0
  AND ABS(ROUND((spend - sx / n)
          / SQRT((sxx - sx * sx / n) / (n - 1)), 4)) > 2.5
ORDER BY custkey
"""


def customer_spend_anomalies_mad(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust anomaly scoring: customers whose total spend is an outlier
    within their market segment by the MEDIAN/MAD rule (modified z-score
    |0.6745·(x − med)/MAD| > 3.5, the Iglewicz–Hoaglin cutoff). The
    mean/std z-score twin (:func:`customer_spend_anomalies_zscore`) is
    itself dragged by the outliers it hunts — one whale inflates σ and
    hides the next whale; median and MAD have a 50 % breakdown point, so
    the flag is stable under contamination. This is the robust-statistics
    member of the anomaly family a curation pipeline actually wants for
    heavy-tailed spend/length/score columns.

    Scale shape: two bounded aggregates instead of moments — per-segment
    exact median (``F.percentile``, the interpolated definition both
    engines share), then per-segment median of |x − med| after
    broadcasting the 5-row median table back. The facts shuffle on
    custkey once for the spend sum; the segment aggregates see only
    (segment, value) pairs. Spend sums in DECIMAL (order-independent),
    deviations are exact double subtraction of engine-identical values,
    so round-4 scores cannot flip on a last-ulp. Degenerate segments
    (MAD = 0) are guarded to NULL, never flagged."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("spend")
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_custkey").alias("custkey"),
            "spend",
        )
    )
    med = spend.groupBy("mktsegment").agg(
        F.percentile(F.col("spend"), F.lit(0.5)).alias("med")
    )
    dev = spend.join(F.broadcast(med), "mktsegment").withColumn(
        "absdev", F.abs(F.col("spend") - F.col("med"))
    )
    mad = dev.groupBy("mktsegment").agg(
        F.percentile(F.col("absdev"), F.lit(0.5)).alias("mad")
    )
    rz = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (F.col("spend") - F.col("med")) / F.col("mad"),
    )
    return (
        dev.join(F.broadcast(mad), "mktsegment")
        .withColumn("rz", F.round(rz, 4))
        .filter(F.abs(F.col("rz")) > 3.5)
        .select(
            "custkey",
            "mktsegment",
            F.round("spend", 2).alias("spend"),
            F.round("med", 2).alias("segment_median"),
            "rz",
        )
        .orderBy("custkey")
    )


CUSTOMER_SPEND_ANOMALIES_MAD_SQL = """
WITH spend AS (
  SELECT c.c_mktsegment AS mktsegment, o.o_custkey AS custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS spend
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
med AS (
  SELECT mktsegment, quantile_cont(spend, 0.5) AS med
  FROM spend GROUP BY mktsegment
),
dev AS (
  SELECT s.*, m.med, ABS(s.spend - m.med) AS absdev
  FROM spend s JOIN med m USING (mktsegment)
),
mad AS (
  SELECT mktsegment, quantile_cont(absdev, 0.5) AS mad
  FROM dev GROUP BY mktsegment
)
SELECT custkey, mktsegment, ROUND(spend, 2) AS spend,
       ROUND(med, 2) AS segment_median,
       ROUND(0.6745 * (spend - med) / mad, 4) AS rz
FROM dev JOIN mad USING (mktsegment)
WHERE mad > 0
  AND ABS(ROUND(0.6745 * (spend - med) / mad, 4)) > 3.5
ORDER BY custkey
"""


def orders_price_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-priority price statistics: order prices clipped to
    the global [p01, p99] band before aggregating — the standard
    outlier-capping step a feature pipeline runs before normalization,
    so a single fat-finger order can't drag a training feature's mean.
    Reports per priority the row count, how many rows clipped at each
    tail, and the winsorized mean.

    Scale shape: the two boundaries come from ONE exact-percentile
    aggregate (1 row, broadcast back — never a rank window over the
    fact table); clipping is a per-row LEAST/GREATEST projection and
    the stats are a plain hash aggregation. Clipped values are summed
    in DECIMAL (order-independent) so the round-4 mean is
    engine-identical."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("v")
    )
    b = o.agg(
        F.percentile(F.col("v"), F.lit(0.01)).alias("__p01"),
        F.percentile(F.col("v"), F.lit(0.99)).alias("__p99"),
    )
    clip = F.least(F.greatest(F.col("v"), F.col("__p01")), F.col("__p99"))
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("v") < F.col("__p01"), 1).otherwise(0)
            ).cast("bigint").alias("n_clip_lo"),
            F.sum(
                F.when(F.col("v") > F.col("__p99"), 1).otherwise(0)
            ).cast("bigint").alias("n_clip_hi"),
            # cast the exact decimal SUM to double BEFORE dividing, the
            # same op order as the oracle's CAST(SUM(...) AS DOUBLE)/n
            F.round(
                F.sum(clip.cast(DEC)).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("wins_mean"),
        )
        .orderBy("priority")
    )


ORDERS_PRICE_WINSORIZED_SQL = """
WITH q AS (
  SELECT quantile_cont(o_totalprice, 0.01) AS p01,
         quantile_cont(o_totalprice, 0.99) AS p99
  FROM orders
)
SELECT o_orderpriority AS priority,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_totalprice < p01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(SUM(CASE WHEN o_totalprice > p99 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(o_totalprice, p01), p99)
                           AS DECIMAL(38,10))) AS DOUBLE)
             / COUNT(*), 4) AS wins_mean
FROM orders CROSS JOIN q
GROUP BY 1
ORDER BY priority
"""


# half-life 7 days against a fixed post-corpus reference instant: the
# exponent is <= 0 for every event, so the term never overflows
_REF = "2024-02-01 00:00:00"
_HALFLIFE_S = 7 * 86400.0


def events_recency_weighted_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user recency-weighted engagement: Σ value · 2^(−age/halflife)
    at a fixed reference time — the training-feature spelling of "recent
    activity matters more". Narrow projection + one aggregation shuffle;
    per-term decimal(38,6) quantization makes the sum engine-exact."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    age_s = F.lit(_REF).cast("timestamp").cast("double") - epoch_seconds(
        F.col("ts")
    )
    term = (
        F.col("value") * F.exp(-F.lit(0.6931471805599453) * age_s / _HALFLIFE_S)
    ).cast("decimal(38,6)")
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(F.sum(term), 4).cast("double").alias("decayed_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


EVENTS_RECENCY_WEIGHTED_VALUE_SQL = f"""
SELECT user_id,
       CAST(ROUND(SUM(CAST(value * EXP(-0.6931471805599453
           * (EPOCH(TIMESTAMP '{_REF}') - EPOCH(ts)) / {_HALFLIFE_S})
           AS DECIMAL(38,6))), 4) AS DOUBLE) AS decayed_value,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic lifecycle scoring every commerce
    warehouse runs: per customer, Recency (days since last order,
    relative to the corpus's latest order date), Frequency (order
    count), Monetary (decimal-exact spend), each scored 1-4 by which
    exact quartile of the customer population it falls in, concatenated
    into the segment label ("444" = best).

    Scale shape: NO global ranking window (an ntile over all customers
    funnels the dimension through one task) — the three quartile
    boundary triples come from ONE exact-percentile aggregate (1 row,
    9 values, broadcast back), and scoring is per-row comparisons
    against them, fully distributed. Boundary determinism: monetary
    sums in decimal (order-independent), percentiles are the linear-
    interpolation definition both engines share, and scores use
    half-open `(lo, hi]` bins via strict `>` comparisons so a value
    exactly ON a boundary bins identically in both engines."""
    o = load(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("__ref"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .withColumn(
            "recency_days",
            F.datediff(F.col("__ref"), F.col("__last")).cast("int"),
        )
        .drop("__last", "__ref")
    )
    q = cust.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(p)).alias(
                f"__{c}_{int(p * 100)}"
            )
            for c in ("recency_days", "frequency", "monetary")
            for p in (0.25, 0.5, 0.75)
        ]
    )

    def score(c: str, invert: bool) -> F.Column:
        v = F.col(c).cast("double")
        raw = (
            F.lit(1)
            + F.when(v > F.col(f"__{c}_25"), 1).otherwise(0)
            + F.when(v > F.col(f"__{c}_50"), 1).otherwise(0)
            + F.when(v > F.col(f"__{c}_75"), 1).otherwise(0)
        )
        return (F.lit(5) - raw if invert else raw).cast("int")

    scored = cust.crossJoin(F.broadcast(q)).select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary",
        score("recency_days", invert=True).alias("r_score"),
        score("frequency", invert=False).alias("f_score"),
        score("monetary", invert=False).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    ).orderBy("custkey")


CUSTOMER_RFM_SEGMENTS_SQL = """
WITH cust AS (
  SELECT o_custkey AS custkey,
         CAST(DATE_DIFF('day', MAX(o_orderdate),
              (SELECT MAX(o_orderdate) FROM orders)) AS INT)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
           AS monetary
  FROM orders GROUP BY o_custkey
), q AS (
  SELECT quantile_cont(recency_days, 0.25) AS r25,
         quantile_cont(recency_days, 0.50) AS r50,
         quantile_cont(recency_days, 0.75) AS r75,
         quantile_cont(frequency, 0.25) AS f25,
         quantile_cont(frequency, 0.50) AS f50,
         quantile_cont(frequency, 0.75) AS f75,
         quantile_cont(monetary, 0.25) AS m25,
         quantile_cont(monetary, 0.50) AS m50,
         quantile_cont(monetary, 0.75) AS m75
  FROM cust
), scored AS (
  SELECT custkey, recency_days, frequency, monetary,
         CAST(5 - (1 + CASE WHEN recency_days > r25 THEN 1 ELSE 0 END
                     + CASE WHEN recency_days > r50 THEN 1 ELSE 0 END
                     + CASE WHEN recency_days > r75 THEN 1 ELSE 0 END)
              AS INT) AS r_score,
         CAST(1 + CASE WHEN frequency > f25 THEN 1 ELSE 0 END
                + CASE WHEN frequency > f50 THEN 1 ELSE 0 END
                + CASE WHEN frequency > f75 THEN 1 ELSE 0 END
              AS INT) AS f_score,
         CAST(1 + CASE WHEN monetary > m25 THEN 1 ELSE 0 END
                + CASE WHEN monetary > m50 THEN 1 ELSE 0 END
                + CASE WHEN monetary > m75 THEN 1 ELSE 0 END
              AS INT) AS m_score
  FROM cust CROSS JOIN q
)
SELECT custkey, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored
ORDER BY custkey
"""


def lineitem_quantity_return_woe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weight-of-evidence / information-value of line-item quantity
    against the returned flag (round-16 build,
    ``reduction.binned_woe_iv``) — the credit-scoring screen beside
    the ANOVA-F/MI/χ² relevance tier: per-bin WOE gives the direction
    and monotonicity of the quantity→return relationship, IV the
    single scalar screeners threshold. Fixed [0, 50) geometry (the
    TPC-H quantity domain; 50 clamps into the top bin on both
    engines), eps=0.5 Laplace smoothing over observed bins so the
    statistic is total and engine-exact. One scan into a ≤ 10-row
    agg; totals ride a K-row unpartitioned window (bounded by
    construction)."""
    from realtime_data_pipeline_spark import reduction

    li = load(spark, sf_dir, "lineitem").select(
        "l_quantity",
        (F.col("l_returnflag") == "R").cast("int").alias("is_return"),
    )
    woe = reduction.binned_woe_iv(
        li, "l_quantity", "is_return", n_bins=10, lo=0.0, hi=50.0
    )
    return woe.select(
        "bin",
        "bin_lo",
        "n",
        "n_pos",
        "n_neg",
        F.round("woe", 6).alias("woe"),
        F.round("iv", 6).alias("iv"),
    ).orderBy("bin")


LINEITEM_QUANTITY_RETURN_WOE_SQL = """
WITH b AS (
  SELECT LEAST(9, GREATEST(0,
           CAST(FLOOR(CAST(l_quantity AS DOUBLE) / 5.0) AS INT)
         )) AS bin,
         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
), g AS (
  SELECT bin,
         COUNT(*) AS n,
         SUM(y) AS n_pos,
         COUNT(*) - SUM(y) AS n_neg
  FROM b GROUP BY bin
), t AS (
  SELECT bin, n, n_pos, n_neg,
         SUM(n_pos) OVER () AS p_tot,
         SUM(n_neg) OVER () AS n_tot,
         COUNT(*) OVER () AS k
  FROM g
)
SELECT CAST(bin AS INT) AS bin,
       bin * 5.0 AS bin_lo,
       n,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       ROUND(LN(((n_pos + 0.5) / (p_tot + 0.5 * k))
              / ((n_neg + 0.5) / (n_tot + 0.5 * k))), 6) AS woe,
       ROUND(SUM(((n_pos + 0.5) / (p_tot + 0.5 * k)
                  - (n_neg + 0.5) / (n_tot + 0.5 * k))
                 * LN(((n_pos + 0.5) / (p_tot + 0.5 * k))
                    / ((n_neg + 0.5) / (n_tot + 0.5 * k))))
             OVER (), 6) AS iv
FROM t
ORDER BY bin
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "orders_price_anomalies_zscore": orders_price_anomalies_zscore,
    "customer_spend_anomalies_zscore": customer_spend_anomalies_zscore,
    "customer_spend_anomalies_mad": customer_spend_anomalies_mad,
    "orders_price_winsorized": orders_price_winsorized,
    "events_recency_weighted_value": events_recency_weighted_value,
    "customer_rfm_segments": customer_rfm_segments,
    # round-16 build: WOE/IV binned feature relevance
    "lineitem_quantity_return_woe": lineitem_quantity_return_woe,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "lineitem_quantity_return_woe": LINEITEM_QUANTITY_RETURN_WOE_SQL,
    "orders_price_winsorized": ORDERS_PRICE_WINSORIZED_SQL,
    "orders_price_anomalies_zscore": ORDERS_PRICE_ANOMALIES_ZSCORE_SQL,
    "customer_spend_anomalies_zscore": CUSTOMER_SPEND_ANOMALIES_ZSCORE_SQL,
    "customer_spend_anomalies_mad": CUSTOMER_SPEND_ANOMALIES_MAD_SQL,
    "events_recency_weighted_value": EVENTS_RECENCY_WEIGHTED_VALUE_SQL,
    "customer_rfm_segments": CUSTOMER_RFM_SEGMENTS_SQL,
}
