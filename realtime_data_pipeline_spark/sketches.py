"""Count-min sketch as a plain DataFrame — a mergeable frequency sketch
with no UDFs, no driver state, and exact distributed semantics.

The sketch IS a ``(depth, bucket) -> n`` table: row ``(d, b, n)`` says
"hash_d landed n input rows in bucket b", with ``hash_d(key) =
pmod(xxhash64(key, seed=d), width)``. That representation makes every
property structural:

* **building** is one groupBy over a ``depth``-way explode of the input —
  map-side partials do the heavy lifting, the shuffle carries at most
  ``depth × width`` rows per map partition;
* **merging** is union + re-aggregate: counts add, so
  ``sketch(A ∪ B) == merge(sketch(A), sketch(B))`` EXACTLY (tested),
  which is what makes it a streaming/rollup partial — the same
  contract as the HLL partials in ``continuous_rollup``;
* **querying** broadcasts the sketch (``depth × width`` rows — tiny by
  construction) against the probe keys and takes ``min(n)`` over the
  depths: the classic one-sided estimate, ``true <= est <= true + εN``
  with ε ≈ e/width at the usual confidence for depth rows.

Classic reference: Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications" (2005). The point of
carrying it alongside exact heavy-hitters (`ops.top_k`): at 100 TB a
per-key exact count of a high-cardinality column shuffles the key space;
the sketch shuffles ``depth × width`` integers regardless of
cardinality, and stays mergeable across days/streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def countmin_build(
    df: DataFrame, col: str, depth: int = 5, width: int = 1024
) -> DataFrame:
    """Sketch the frequency of ``col``: returns the ``(depth, bucket, n)``
    table (missing (d, b) pairs mean 0) with the GEOMETRY stamped on
    every row (``__depth_total``/``__width``) — estimates are only
    meaningful against the geometry the sketch was built with, so it
    travels with the data instead of being a parameter a caller can get
    wrong. NULL keys are counted like any other value (xxhash64 of NULL
    = seed hash, one ordinary bucket)."""
    rows = df.select(
        F.explode(
            F.array(*[F.lit(d) for d in range(depth)])
        ).alias("__depth"),
        F.col(col).alias("__key"),
    )
    return (
        rows.select(
            "__depth",
            F.pmod(
                F.xxhash64(F.col("__key"), F.col("__depth")), F.lit(width)
            ).alias("__bucket"),
        )
        .groupBy("__depth", "__bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "__depth",
            "__bucket",
            "n",
            F.lit(depth).alias("__depth_total"),
            F.lit(width).alias("__width"),
        )
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Union + re-aggregate: exact, associative, commutative — the
    partial-merge contract that makes the sketch a rollup/stream
    partial. Geometry columns ride through the groupBy; sketches of
    DIFFERENT geometry cannot be merged meaningfully and surface as
    mixed ``__width`` rows, which :func:`countmin_query` rejects."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(
        "__depth", "__bucket", "__depth_total", "__width"
    ).agg(F.sum("n").alias("n"))


def countmin_query(
    sketch: DataFrame, probes: DataFrame, col: str
) -> DataFrame:
    """Estimated frequency for each distinct probe key: broadcast the
    (tiny) sketch against the probes' per-depth buckets and take the
    min across depths. Geometry comes FROM the sketch (one bounded
    1-row aggregate — persist the sketch if querying repeatedly, its
    lineage re-runs otherwise); mixed-geometry sketches (a bad merge)
    are rejected. A (depth, bucket) pair absent from the sketch means
    0 — a key never seen estimates 0, not NULL, including against an
    EMPTY sketch (nothing was ever counted)."""
    geo = sketch.agg(
        F.first("__depth_total").alias("d"),
        F.first("__width").alias("w"),
        F.count_distinct("__depth_total", "__width").alias("geoms"),
    ).first()
    if geo["geoms"] > 1:
        raise ValueError(
            "countmin_query: sketch mixes geometries — it was merged "
            "from sketches built with different depth/width"
        )
    if geo["d"] is None:  # empty sketch: every estimate is 0
        return (
            probes.select(F.col(col)).distinct()
            .withColumn("est_count", F.lit(0).cast("bigint"))
        )
    depth, width = int(geo["d"]), int(geo["w"])
    keyed = probes.select(F.col(col).alias("__key")).distinct().select(
        "__key",
        F.explode(
            F.array(*[F.lit(d) for d in range(depth)])
        ).alias("__depth"),
    ).select(
        "__key",
        "__depth",
        F.pmod(
            F.xxhash64(F.col("__key"), F.col("__depth")), F.lit(width)
        ).alias("__bucket"),
    )
    return (
        keyed.join(F.broadcast(sketch), ["__depth", "__bucket"], "left")
        .groupBy("__key")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
        .select(F.col("__key").alias(col), "est_count")
    )


def histogram_build(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 256
) -> DataFrame:
    """Fixed-bin histogram of ``col`` over [lo, hi): a ``(bin, n)``
    DataFrame with the geometry stamped on every row — the MERGEABLE
    quantile/distribution partial (``percentile_approx``'s sketch is not
    exposed as a reusable partial in the SQL surface; a fixed-bin
    histogram is, trivially: counts add). Out-of-range values clamp to
    the edge bins (min/max live in `ops.profile_table` — pick lo/hi from
    there); NULLs are dropped and reported via the profile, not here.
    Quantile error is bounded by one bin width."""
    # loud geometry check, matching the query functions: hi <= lo makes
    # the bin width <= 0 so every value would silently clamp into bin 0
    # and histogram_quantile would report lo for every quantile
    if hi <= lo:
        raise ValueError(f"histogram_build requires lo < hi, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"histogram_build requires bins >= 1, got {bins}")
    w = (hi - lo) / bins
    bin_ = F.least(
        F.greatest(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(w)).cast("int"),
            F.lit(0),
        ),
        F.lit(bins - 1),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "__bin",
            "n",
            F.lit(float(lo)).alias("__lo"),
            F.lit(float(hi)).alias("__hi"),
            F.lit(bins).alias("__bins"),
        )
    )


def histogram_merge(*hists: DataFrame) -> DataFrame:
    """Union + re-aggregate — exact, like :func:`countmin_merge`; mixed
    geometries surface as distinct ``__lo``/``__hi``/``__bins`` rows and
    are rejected at quantile time."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("__bin", "__lo", "__hi", "__bins").agg(
        F.sum("n").alias("n")
    )


def histogram_quantile(hist: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates from the histogram: one cumulative window over
    the (≤ bins)-row table, linear interpolation inside the landing bin.
    |estimate − true quantile| ≤ one bin width for in-range data."""
    from pyspark.sql import Window

    geo = hist.agg(
        F.first("__lo").alias("lo"),
        F.first("__hi").alias("hi"),
        F.first("__bins").alias("b"),
        F.count_distinct("__lo", "__hi", "__bins").alias("geoms"),
        F.sum("n").alias("total"),
    ).first()
    if geo["geoms"] > 1:
        raise ValueError(
            "histogram_quantile: mixed geometries — merged from "
            "histograms built with different lo/hi/bins"
        )
    if not geo["total"]:
        raise ValueError("histogram_quantile: empty histogram")
    lo, hi, bins, total = (
        float(geo["lo"]), float(geo["hi"]), int(geo["b"]), int(geo["total"])
    )
    w = (hi - lo) / bins
    cum = hist.select(
        "__bin",
        "n",
        F.sum("n")
        .over(Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum"),
    )
    probes = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    ).withColumn("__rank", F.col("q") * F.lit(float(total)))
    # the landing bin: first bin whose cumulative count reaches the rank
    landed = (
        probes.join(cum, F.col("__cum") >= F.col("__rank"))
        .groupBy("q", "__rank")
        .agg(F.min_by(F.struct("__bin", "n", "__cum"), "__bin").alias("b"))
    )
    frac = (
        F.col("__rank") - (F.col("b.__cum") - F.col("b.n"))
    ) / F.greatest(F.col("b.n"), F.lit(1))
    return landed.select(
        "q",
        (
            F.lit(lo)
            + (F.col("b.__bin") + F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)))
            * F.lit(w)
        ).alias("estimate"),
    ).orderBy("q")
