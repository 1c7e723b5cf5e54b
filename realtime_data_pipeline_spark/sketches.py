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


def misra_gries_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries: ≤ ``k`` rows
    ``(item, lb, __k)`` per input partition, where ``lb`` is a LOWER
    bound on the item's in-partition frequency undercounting by at most
    ``N_partition/(k+1)``. The dual of :func:`countmin_build`: count-min
    answers "how often is THIS key" (one-sided over-estimate, fixed
    geometry), Misra-Gries answers "WHICH keys are frequent" (one-sided
    under-estimate, ≤ k candidates) — the vocabulary/boilerplate/hot-key
    discovery sketch, with the guarantee that every item with true
    frequency > N/(k+1) SURVIVES.

    Why this is the 100 TB shape: an exact per-key count of a
    high-cardinality column shuffles the whole key space; this emits at
    most k rows per map partition, no matter the cardinality — the
    shuffle is bounded by geometry, like every sketch here. Per
    partition the classic deterministic algorithm runs Arrow-batched
    (pandas ``value_counts`` + add per batch, then the decrement-by-the-
    (k+1)th-largest compression whenever more than k counters live —
    Misra & Gries 1982, batched as in Agarwal et al.'s "Mergeable
    Summaries"). NULL keys are ignored (unlike count-min, which buckets
    them); results depend on partition layout only through the lbs —
    the survival guarantee holds for any layout."""
    import pandas as pd

    from pyspark.sql import types as T

    item_type = df.schema[col].dataType
    out_schema = T.StructType(
        [
            T.StructField("item", item_type, True),
            T.StructField("lb", T.LongType(), False),
            T.StructField("__k", T.IntegerType(), False),
        ]
    )

    def summarize(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf[col].value_counts()  # dropna by default
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > k:
                thr = acc.nlargest(k + 1).iloc[-1]
                acc = acc - thr
                acc = acc[acc > 0]
        if acc is not None and len(acc):
            yield pd.DataFrame(
                {
                    "item": acc.index,
                    "lb": acc.astype("int64").to_numpy(),
                    "__k": k,
                }
            )

    return df.select(col).mapInPandas(summarize, schema=out_schema)


def misra_gries_merge(*partials: DataFrame) -> DataFrame:
    """Merge Misra-Gries summaries (Agarwal et al. mergeable rule):
    counts for the same item ADD, then if more than k counters survive,
    the (k+1)th largest combined count is subtracted from all and
    non-positive counters drop. The merged summary keeps the full
    guarantee — total undercount ≤ N_total/(k+1), every item above that
    threshold still present. Runs entirely on sketch-sized data
    (≤ k × partitions rows), so the single-partition ranking window and
    the broadcast threshold are bounded by geometry, never by the
    input. Mixed-k summaries are rejected."""
    from pyspark.sql.window import Window as W

    out = partials[0]
    for s in partials[1:]:
        out = out.unionByName(s)
    summed = out.groupBy("item", "__k").agg(F.sum("lb").alias("lb"))
    geo = summed.agg(F.count_distinct("__k").alias("ks")).first()
    if geo["ks"] > 1:
        raise ValueError(
            "misra_gries_merge: summaries built with different k"
        )
    ranked = summed.withColumn(
        "__rn",
        F.row_number().over(
            W.orderBy(F.col("lb").desc(), F.col("item").asc())
        ),
    )
    thr = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == F.col("__k") + 1, F.col("lb"))),
            F.lit(0),
        ).alias("__thr")
    )
    return (
        ranked.crossJoin(F.broadcast(thr))
        .select(
            "item",
            (F.col("lb") - F.col("__thr")).alias("lb"),
            "__k",
        )
        .filter(F.col("lb") > 0)
    )


def misra_gries_topk(df: DataFrame, col: str, k: int) -> DataFrame:
    """End-to-end heavy hitters: per-partition summaries merged into one
    ≤ k-row candidate table ``(item, lb)`` — every item with true
    frequency > N/(k+1) guaranteed present, each lb a certified lower
    bound (true count ≥ lb, and ≤ lb + N/(k+1))."""
    return misra_gries_merge(misra_gries_partials(df, col, k)).drop("__k")


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


def countmin_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join CARDINALITY estimate from two count-min sketches — the
    classic count-min inner product (Cormode & Muthukrishnan 2005 §4.2):
    the true join size is Σ_k f_a(k)·f_b(k), each depth's
    Σ_b a[d,b]·b[d,b] equals that PLUS nonnegative collision cross-terms
    (a one-sided OVERESTIMATE, expected excess ≤ N_a·N_b/width), and the
    min across depths is the estimate. This is the optimizer/planner
    question — "how big is this join going to be?" — answered from two
    tiny mergeable tables without touching either input: decide
    broadcast-vs-shuffle, pre-size shuffle partitions, or refuse a
    runaway fan-out join before paying for it.

    Scale shape: both sketches are geometry-bounded (depth×width rows
    max); the estimate is one broadcast equi-join on (depth, bucket) +
    one ≤depth-row aggregate. Missing (depth, bucket) pairs mean 0 and
    contribute nothing, so the inner join is exact. Geometries must
    match (same depth, width, AND the same hash family — these sketches
    all use xxhash64(key, depth), so equal geometry ⇒ comparable
    buckets); mismatches are rejected loudly. Either sketch empty ⇒ 0.

    Returns a 1-row DataFrame ``(est_join_rows bigint)``."""
    spark = sketch_a.sparkSession
    geos = []
    for s in (sketch_a, sketch_b):
        g = s.agg(
            F.first("__depth_total").alias("d"),
            F.first("__width").alias("w"),
            F.count_distinct("__depth_total", "__width").alias("geoms"),
        ).first()
        if g["geoms"] > 1:
            raise ValueError(
                "countmin_join_size: sketch mixes geometries — it was "
                "merged from sketches built with different depth/width"
            )
        geos.append(g)
    ga, gb = geos
    if ga["d"] is None or gb["d"] is None:  # empty side: join size 0
        return spark.range(1).select(
            F.lit(0).cast("bigint").alias("est_join_rows")
        )
    if (ga["d"], ga["w"]) != (gb["d"], gb["w"]):
        raise ValueError(
            "countmin_join_size: geometry mismatch — "
            f"({ga['d']}x{ga['w']}) vs ({gb['d']}x{gb['w']}); inner "
            "products are only meaningful between sketches of the same "
            "depth/width"
        )
    b = sketch_b.select(
        "__depth", "__bucket", F.col("n").alias("__nb")
    )
    per_depth = (
        sketch_a.join(F.broadcast(b), ["__depth", "__bucket"])
        .groupBy("__depth")
        .agg(F.sum(F.col("n") * F.col("__nb")).alias("__dot"))
    )
    # a depth whose bucket sets don't overlap at all has dot product 0
    # but NO row after the inner join — min over the surviving rows
    # would overshoot. If any depth is missing, the estimate is 0 (the
    # true join size is bounded by EVERY depth's dot product).
    return per_depth.agg(
        F.when(
            F.count(F.lit(1)) == int(ga["d"]),
            F.coalesce(F.min("__dot"), F.lit(0)),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("est_join_rows")
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


# ---------------------------------------------------------------------------
# Bloom filter as a plain DataFrame — a mergeable MEMBERSHIP sketch with
# the same contract as the count-min above: no UDFs, no driver state in
# the build, union+re-aggregate merge. The sketch IS a sparse
# ``(word, bits)`` bitmap table: row ``(w, b)`` says "64-bit word w of
# the bitmap has bits b set", with the k positions double-hashed
# (format v2, Kirsch–Mitzenmacher): ``bit(key, i) = pmod(a + i·b, m)``
# where ``a = pmod(xxhash64(key, 0), m)``, ``b = pmod(xxhash64(key,
# 1), m)`` — 2 hash evaluations per probed row, not k. Its job is the
# scan-side JOIN PRE-FILTER: when the probe side of an equi-join is too
# large to broadcast-join outright but the BITMAP of its key set fits
# in a broadcast (1 KiB per ~1k keys at 1% fp), :func:`bloom_prefilter`
# drops non-candidate rows of the 100 TB side BEFORE any exchange —
# no false negatives, so ``prefilter ∘ join ≡ join`` exactly while the
# shuffle carries only candidates. It pays when the bytes kept out of
# the exchange beat the per-row probe cost (wide-row probes, small
# match fraction — see :func:`bloom_prefilter` for the measured rule);
# the cross-stage reuse (build once, persist the ≤ m/64-row table,
# prefilter many later scans) is what Spark's internal
# InjectRuntimeFilter — same trick, single-query scope — cannot do.
# ---------------------------------------------------------------------------


def _bloom_geometry(expected_items: int, fpp: float, max_bits: int):
    """Standard sizing: ``m = -n ln p / (ln 2)^2``, ``k = (m/n) ln 2``,
    m rounded up to a multiple of 64 and clamped to ``max_bits`` (the
    prefilter materializes m/64 longs driver-side — the clamp bounds
    that; past it the fp rate degrades but membership stays
    conservative, never lossy)."""
    import math

    if expected_items <= 0:
        raise ValueError("bloom_build: expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("bloom_build: fpp must be in (0, 1)")
    m = int(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = min(max(((m + 63) // 64) * 64, 64), max_bits)
    k = max(1, round(m / expected_items * math.log(2)))
    return m, min(k, 16)


def bloom_build(
    df: DataFrame,
    col: str,
    expected_items: int,
    fpp: float = 0.01,
    max_bits: int = 1 << 26,
) -> DataFrame:
    """Membership sketch of ``col``'s value set: the sparse
    ``(__word, __bits)`` bitmap table with the geometry stamped on
    every row (``__m`` bits / ``__k`` probes), like the count-min's
    depth/width. ``expected_items`` is an explicit sizing input (the
    caller knows its key-set scale; no hidden counting job), ``fpp``
    the target false-positive rate at that load.

    Build shape (format v2, Kirsch–Mitzenmacher double hashing): TWO
    tuple-hashes per row — ``a = pmod(xxhash64(key, 0), m)``,
    ``b = pmod(xxhash64(key, 1), m)`` — and the k bit positions derived
    arithmetically as ``pos_i = pmod(a + i·b, m)`` (reducing mod m
    BEFORE the multiply keeps ``a + i·b ≤ 17·m``, so the arithmetic
    never overflows a long under Spark 4's default ANSI mode; the
    identity ``(h1 + i·h2) mod m = ((h1 mod m) + i·(h2 mod m)) mod m``
    preserves the classic double-hashing FP bound). That makes the
    probe side O(2 hashes + k adds) per row instead of O(k hashes) —
    the round-9 fix for the prefilter losing wall-time to its own hash
    cost. Then one groupBy over (word = pos div 64) with a
    map-side-combined ``bit_or`` — the shuffle carries at most m/64
    rows per map partition regardless of input cardinality. NULL keys
    are skipped: equality never matches NULL, so a membership bit for
    one could only manufacture false positives. Type discipline matches
    a join's: probe with the SAME column type the sketch was built from
    (xxhash64 is type-sensitive — a long and its string form hash
    differently). Rows carry ``__v = 2``; :func:`bloom_prefilter`
    refuses sketches without it (a v1 sketch's bits sit at different
    positions — probing it would silently break the no-false-negative
    contract, so persisted v1 sketches must be rebuilt)."""
    m, k = _bloom_geometry(expected_items, fpp, max_bits)
    pos_arr = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(F.col("__a") + i * F.col("__b"), F.lit(m)),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.pmod(F.xxhash64(F.col(col), F.lit(0)), F.lit(m)).alias(
                "__a"
            ),
            F.pmod(F.xxhash64(F.col(col), F.lit(1)), F.lit(m)).alias(
                "__b"
            ),
        )
        .select(F.explode(pos_arr).alias("__pos"))
        .select(
            F.floor(F.col("__pos") / F.lit(64)).alias("__word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("__pos"), F.lit(64)).cast("int"),
            ).alias("__bit"),
        )
        # DENSE table: an all-zero row per word rides the build's own
        # groupBy (m/64 extra input rows, no extra shuffle), so the
        # sketch always has exactly m/64 rows and the probe's densify
        # is a single sort-collect with no zero-fill join. bit_or with
        # 0 is the identity, so merge/build semantics are unchanged.
        .unionByName(
            df.sparkSession.range(m // 64).select(
                F.col("id").alias("__word"),
                F.lit(0).cast("long").alias("__bit"),
            )
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
        .select(
            "__word",
            "__bits",
            F.lit(m).alias("__m"),
            F.lit(k).alias("__k"),
            F.lit(2).alias("__v"),
        )
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union + re-aggregate: bits OR, so ``bloom(A ∪ B) ==
    merge(bloom(A), bloom(B))`` EXACTLY (tested) — the partial-merge
    contract that lets per-day/per-stream sketches roll up. Geometry
    rides the groupBy; mixed-geometry merges surface as mixed ``__m``
    rows, which :func:`bloom_prefilter` rejects. A v1 sketch (no
    ``__v`` column) fails the unionByName loudly — v1 bits sit at
    different positions and must be rebuilt, never merged in."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("__word", "__m", "__k", "__v").agg(
        F.bit_or("__bits").alias("__bits")
    )


def bloom_prefilter(df: DataFrame, col: str, bloom: DataFrame) -> DataFrame:
    """Rows of ``df`` whose ``col`` MAY be in the sketched set — the
    scan-side pre-filter for a later equi-join/semi-join on ``col``:
    no false negatives, so following it with the exact join returns
    exactly the plain join's rows, while everything provably absent
    (and every NULL key, which equality can never match) is dropped
    before the first exchange.

    Probe shape: the sparse table densifies into one ``array<long>``
    row (bounded by m/64 — the build's ``max_bits`` cap exists for
    this) attached via a 1-row broadcast; the probe computes TWO
    tuple-hashes per row (``a``/``b``, reduced mod m) and derives the k
    bit positions arithmetically (``pmod(a + i·b, m)``) — all plain
    ``xxhash64``/``getbit`` column expressions, JVM-side inside the
    scan's codegen stage, no Python in the hot path. An EMPTY sketch
    (built from an empty frame) proves every key absent and returns no
    rows. Refuses a sketch without the ``__v = 2`` stamp: v1 bits sit
    at different positions, and probing them here would silently drop
    true members.

    WHEN IT PAYS (measured, BLOOM_PRUNE.json): the probe costs ~2
    hashes + k bit-tests per row plus a fixed densify+broadcast of the
    m/64-word bitmap; it wins when the bytes it keeps out of the
    exchange outweigh that — i.e. when
    ``(1 − candidate_fraction) × row_bytes`` is large. On local[32],
    where shuffle is memory-speed, NARROW rows (≤ ~16 bytes: the
    isolated 50M×5M long-key leg, 0.48× — i.e. 2× slower) lose even
    with the v2 probe; WIDE rows WIN (40M × ~400 B payload vs 5M keys:
    1.46× with ~98.5% of shuffle rows dropped) — and a real network-
    bound cluster shuffle only shifts the trade further toward the
    bloom. Rule of thumb: apply to joins whose probe side carries
    payload columns and whose match fraction is ≪ 1; skip for
    key-only/narrow shuffles. The cross-STAGE reuse (build once,
    prefilter many later scans) is the part Spark's own
    InjectRuntimeFilter cannot do."""
    if "__v" not in bloom.columns:
        raise ValueError(
            "bloom_prefilter: sketch predates format v2 (double-"
            "hashed positions) — rebuild it with bloom_build; probing "
            "v1 bits here would silently break the no-false-negative "
            "contract"
        )
    geo = bloom.agg(
        F.first("__m").alias("m"),
        F.first("__k").alias("k"),
        F.first("__v").alias("v"),
        F.count_distinct("__m", "__k", "__v").alias("geoms"),
        F.count(F.lit(1)).alias("nrows"),
    ).first()
    if geo["geoms"] > 1:
        raise ValueError(
            "bloom_prefilter: sketch mixes geometries — it was merged "
            "from sketches built with different m/k"
        )
    if geo["m"] is None:  # empty sketch: nothing can be a member
        return df.filter(F.lit(False))
    if int(geo["v"]) != 2:
        raise ValueError(
            f"bloom_prefilter: unsupported sketch format v{geo['v']}"
        )
    m, k = int(geo["m"]), int(geo["k"])
    # densify JVM-side into ONE array<long> row of length m/64. The
    # sketch never visits the driver (the old collect + createDataFrame
    # round-trip cost seconds per call at m = 2^26 and dominated the
    # probe). v2 builds are already dense (exactly m/64 rows), so the
    # common path is a single sort-collect; a sparse v2 table (e.g. a
    # hand-filtered sketch) falls back to a zero-fill union + bit_or
    # first. (A map_from_arrays + per-slot element_at spelling is
    # O((m/64)²) — Catalyst map lookup is a linear scan — so the dense
    # array is assembled by SORTING, never by probing.)
    sparse = bloom.select("__word", "__bits")
    if int(geo["nrows"]) != m // 64:
        sparse = (
            sparse.unionByName(
                bloom.sparkSession.range(m // 64).select(
                    F.col("id").alias("__word"),
                    F.lit(0).cast("long").alias("__bits"),
                )
            )
            .groupBy("__word")
            .agg(F.bit_or("__bits").alias("__bits"))
        )
    dense = (
        sparse.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__word", "__bits"))
            ).alias("__s")
        )
        .select(
            F.transform(F.col("__s"), lambda x: x["__bits"]).alias(
                "__bloom_words"
            )
        )
    )
    # coalesce makes __a/__b provably non-nullable (non-ANSI pmod is
    # nullable to Spark even with a positive literal divisor), so the
    # join condition's inferred isnotnull(__a/__b) constraints prune
    # instead of re-evaluating both hashes in an extra Filter
    a = F.coalesce(
        F.pmod(F.xxhash64(F.col(col), F.lit(0)), F.lit(m)), F.lit(0)
    )
    b = F.coalesce(
        F.pmod(F.xxhash64(F.col(col), F.lit(1)), F.lit(m)), F.lit(0)
    )
    # hashes are projected BELOW the broadcast join on purpose: the
    # k bit-tests land in the join condition, and predicate pushdown
    # would inline a withColumns placed above the join back into each
    # of the k tests (k re-evaluations per row — the exact cost this
    # v2 probe removes). A projection under the join is not inlined;
    # the plan gate test asserts exactly 2 xxhash64 calls survive.
    probed = df.withColumns({"__a": a, "__b": b}).crossJoin(
        F.broadcast(dense)
    )
    cond = F.col(col).isNotNull()
    for i in range(k):
        pos = F.pmod(F.col("__a") + i * F.col("__b"), F.lit(m))
        word = F.element_at(
            F.col("__bloom_words"),
            (F.floor(pos / F.lit(64)) + F.lit(1)).cast("int"),
        )
        cond = cond & (
            F.getbit(word, F.pmod(pos, F.lit(64)).cast("int")) == 1
        )
    return probed.filter(cond).drop("__bloom_words", "__a", "__b")


# ---------------------------------------------------------------------------
# Mergeable RANK sketch — a deterministic KLL-shaped compactor hierarchy
# as a plain DataFrame, closing the unbounded-range quantile gap the
# fixed-bin histogram above cannot: `histogram_build` needs (lo, hi)
# known up front, so a never-seen column (DQ threshold calibration,
# streaming percentiles over open-ended domains) has no mergeable
# quantile partial. This sketch needs NO geometry: the sketch IS a
# ``(level, x)`` table where a row at level L stands for 2^L input rows
# near x. Same discipline as every sketch in this module: map-side
# partials bounded by geometry (≤ k·levels rows per partition, whatever
# the input size), merge = union + re-compact on sketch-sized data, all
# queries plain DataFrame ops.
#
# Shape: the compactor hierarchy of Karnin–Lang–Liberty (KLL, FOCS'16) /
# Agarwal et al. "Mergeable Summaries" (PODS'12), with two deliberate
# deviations, both for DETERMINISM (same input partitioning ⇒ bit-equal
# sketch, the property every oracle/same-config-same-answer test in this
# repo leans on):
#   * fixed capacity k at EVERY level (the Munro–Paterson layout) instead
#     of KLL's geometrically-shrinking lower levels — space k·H rows
#     (H ≈ log2(n/k) levels; 40 levels at 10^12 rows ⋅ k=256 ≈ 10⁴ rows,
#     still nothing) in exchange for a clean deterministic bound;
#   * compaction keeps alternating even/odd ranks via a per-level toggle
#     instead of a coin flip. Each compaction of a weight-w level
#     perturbs any rank by ≤ w; with ≤ n/(k·2^L)·2 compactions at level
#     L the worst-case rank error is ≤ 2·H·n/k (the deterministic
#     Munro–Paterson-style bound; the alternating toggle cancels
#     adjacent errors so observed error sits far below it — the tests
#     pin BOTH: the proven 2H/k worst case always, and a 1/k-scale
#     typical envelope on mixed workloads).
#
# Weight is conserved EXACTLY: a compaction pairs off an even count of
# items (an odd straggler stays at its level), so Σ 2^level == n with no
# drift — total-count questions answered by the sketch are exact, and
# the merge-then-query path can assert it.
# ---------------------------------------------------------------------------


def _kll_compact(levels, toggles, k):
    """In-place compaction pass over ``levels`` (level -> np.ndarray,
    UNSORTED) until every level holds ≤ k items. Deterministic: sort,
    pair off the even-length prefix (odd straggler stays), keep ranks
    ``offset::2`` with the per-level alternating ``offset`` toggle, and
    promote the survivors — now standing for twice the weight — one
    level up. Shared verbatim by the per-partition build and the merge,
    so "merge = re-compact of the unioned sketch rows" is true by
    construction."""
    import numpy as np

    lv = 0
    while lv <= max(levels, default=0):
        buf = levels.get(lv)
        if buf is None or len(buf) <= k:
            lv += 1
            continue
        buf = np.sort(buf)
        if len(buf) % 2:
            levels[lv] = buf[-1:]  # odd straggler keeps its level/weight
            buf = buf[:-1]
        else:
            levels[lv] = buf[:0]
        off = toggles.get(lv, 0)
        toggles[lv] = 1 - off
        kept = buf[off::2]
        nxt = levels.get(lv + 1)
        levels[lv + 1] = (
            kept if nxt is None or not len(nxt) else np.concatenate([nxt, kept])
        )
        # the promotion may overflow lv+1; loop continues upward and
        # re-checks — never recurses, H iterations max per overflow
    # prune emptied buffers so max(levels) stays honest
    for e in [l for l, b in levels.items() if not len(b)]:
        del levels[e]


def kll_partials(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Per-partition rank-sketch partials: ≤ k·H rows ``(level, x,
    __k)`` per input partition, one streaming pass, bounded memory —
    the quantile dual of :func:`misra_gries_partials`. NULLs are
    dropped (report them via `ops.profile_table`, not here); values are
    cast to double. Like the MG partials, the exact rows depend on the
    partition layout; the rank-error guarantee holds for ANY layout."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if k < 2:
        raise ValueError(f"kll_partials requires k >= 2, got {k}")
    out_schema = T.StructType(
        [
            T.StructField("level", T.IntegerType(), False),
            T.StructField("x", T.DoubleType(), False),
            T.StructField("__k", T.IntegerType(), False),
        ]
    )

    def summarize(batches):
        levels: dict = {}
        toggles: dict = {}
        for pdf in batches:
            vals = pdf[col].to_numpy(dtype="float64", na_value=np.nan)
            vals = vals[~np.isnan(vals)]
            if not len(vals):
                continue
            l0 = levels.get(0)
            levels[0] = (
                vals if l0 is None or not len(l0) else np.concatenate([l0, vals])
            )
            _kll_compact(levels, toggles, k)
        rows = [
            (lv, float(x), k) for lv, buf in levels.items() for x in buf
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["level", "x", "__k"])

    return df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        summarize, schema=out_schema
    )


def kll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge rank sketches: union the ``(level, x)`` rows and re-run the
    SAME compactor over them, seeding each item at its carried level so
    its 2^level weight is preserved. Runs on sketch-sized data only
    (≤ k·H rows per input sketch — the one-group ``applyInPandas`` is
    bounded by geometry, the same stance as ``misra_gries_merge``'s
    single-partition window). Mixed-k sketches are rejected; the merged
    sketch keeps exact weight conservation and the 2H/k worst-case rank
    bound (H of the MERGED size)."""
    import numpy as np
    import pandas as pd

    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    geo = out.agg(F.count_distinct("__k").alias("ks")).first()
    if (geo["ks"] or 0) > 1:
        raise ValueError("kll_merge: sketches built with different k")

    def remerge(pdf: pd.DataFrame) -> pd.DataFrame:
        k = int(pdf["__k"].iloc[0])
        levels: dict = {}
        for lv, grp in pdf.groupby("level"):
            levels[int(lv)] = grp["x"].to_numpy(dtype="float64")
        _kll_compact(levels, {}, k)
        rows = [
            (lv, float(x), k) for lv, buf in levels.items() for x in buf
        ]
        return pd.DataFrame(rows, columns=["level", "x", "__k"])

    return out.groupBy(F.lit(1).alias("__g")).applyInPandas(
        remerge, schema="level int, x double, __k int"
    )


def kll_build(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """End-to-end rank sketch of ``col``: distributed per-partition
    partials folded by one sketch-sized merge. The returned ``(level,
    x, __k)`` table answers any-quantile / any-rank questions with
    worst-case rank error ≤ 2·H·n/k (H = #levels ≈ log2(n/k)) and NO
    up-front geometry — persist it, merge it across days/streams, query
    it long after the data is gone."""
    return kll_merge(kll_partials(df, col, k))


def kll_quantile(sketch: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates from a rank sketch: weight items 2^level, one
    cumulative window over the ≤ k·H-row table (geometry-bounded, like
    every sketch query here), report the first x whose cumulative
    weight reaches ceil(q·W). Exact on an uncompacted sketch (all rows
    still at level 0 — then it IS the order statistic); ≤ 2H/k rank
    error otherwise."""
    from pyspark.sql import Window

    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"kll_quantile: q must be in [0, 1], got {q}")
    geo = sketch.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), level)")).alias("w"),
        F.count_distinct("__k").alias("ks"),
    ).first()
    if (geo["ks"] or 0) > 1:
        raise ValueError("kll_quantile: mixed-k sketch — merge rejected it?")
    if not geo["w"]:
        raise ValueError("kll_quantile: empty sketch")
    total = int(geo["w"])
    cum = sketch.select(
        "x",
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), level)"))
        .over(
            Window.orderBy("x", "level").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("__cum"),
    )
    probes = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    ).withColumn(
        "__rank",
        F.greatest(F.ceil(F.col("q") * F.lit(float(total))), F.lit(1)),
    )
    return (
        probes.join(cum, F.col("__cum") >= F.col("__rank"))
        .groupBy("q")
        .agg(F.min("x").alias("estimate"))
        .orderBy("q")
    )


def kll_rank(sketch: DataFrame, vals: list[float]) -> DataFrame:
    """Approximate CDF at the probe values: ``(x, rank_est, frac)``
    where rank_est = Σ weights of sketch items ≤ x (within ± 2H·n/k of
    the true rank) and frac = rank_est / n. The inverse query of
    :func:`kll_quantile` — "what fraction of the corpus sits below this
    DQ threshold" without rescanning the corpus."""
    geo = sketch.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), level)")).alias("w")
    ).first()
    if not geo["w"]:
        raise ValueError("kll_rank: empty sketch")
    total = int(geo["w"])
    probes = sketch.sparkSession.createDataFrame(
        [(float(v),) for v in vals], "x double"
    )
    w = F.expr("shiftleft(CAST(1 AS BIGINT), level)")
    return (
        probes.join(
            sketch.select(F.col("x").alias("__sx"), w.alias("__w")),
            F.col("__sx") <= F.col("x"),
            "left",
        )
        .groupBy("x")
        .agg(
            F.coalesce(F.sum("__w"), F.lit(0)).alias("rank_est"),
            F.round(
                F.coalesce(F.sum("__w"), F.lit(0)) / F.lit(float(total)), 6
            ).alias("frac"),
        )
        .orderBy("x")
    )
