"""Reusable relational operators beyond raw DataFrame methods.

All are pure DataFrame compositions — Catalyst sees through every one of
them (no UDFs, no collects), so pushdown/pruning/AQE apply unchanged.
These fill SURVEY.md §2.3/§2.5/§2.6 gaps the reference never needed
(single-table pipeline) but an engine must expose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(col: Column) -> Column:
    """Fractional epoch seconds from EITHER timestamp flavor. Spark 4
    forbids casting TIMESTAMP_NTZ straight to double; routing through
    timestamp_ltz interprets naive wall-clock in the session time zone
    (pinned UTC in session.py) and is a no-op for LTZ inputs. Time
    DIFFERENCES of these values are TZ-invariant, which is all the as-of
    and sessionize operators consume."""
    return col.cast("timestamp_ltz").cast("double")


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives in fewer partitions (one small file, driver-lifted rows).

    At target scale the scan already yields >= cores splits
    (``spark.sql.files.maxPartitionBytes``) and this is a no-op — the guard
    exists for the small-input case, where a single split would otherwise
    serialize every downstream stage (Arrow UDFs included) onto one core.
    Pass key columns to hash-partition by them; otherwise round-robin.

    For file-backed inputs the guard probes ``inputFiles()`` — an
    analyzed-plan traversal, cheap and side-effect-free — instead of
    ``df.rdd.getNumPartitions()``, which forces FULL physical planning +
    RDD DAG conversion on the driver per call (round-4 advisory). File
    count under-counts splits only in the one-giant-file case, where the
    extra exchange is noise next to the single-split scan it fixes.
    Non-file inputs (driver-lifted rows, range) keep the RDD probe:
    their plans are local and tiny, so the conversion is too.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if target <= 1:
        return df
    files = df.inputFiles()
    n_src = len(files) if files else df.rdd.getNumPartitions()
    if n_src >= max(2, target // 2):
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number (L3). Shuffles once on the group
    keys; at scale prefer this over sort-limit per group collectors.
    Pass fully deterministic ``order_cols`` (include a unique tiebreaker)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join (J5): for each left row, attach the most recent right row
    with ``right_ts <= left_ts`` within the same ``on`` key.

    Spark has no native as-of join. The scalable pattern (instead of a range
    join that explodes, or per-group ``merge_asof`` in pandas) is
    **union + ordered window carry-forward**:

    1. tag both sides, union on (key, ts) with right's value columns;
    2. one window per key ordered by (ts, side) with
       ``last(value, ignorenulls=True)`` carrying the latest right value
       forward;
    3. keep left rows.

    Cost: ONE shuffle on the key (same as any join), no state explosion, no
    skew beyond the key's own skew — this is how you as-of join two 10 TB
    tables. Right-side ties on (key, ts) are broken by taking the last value
    in ``right_ts`` order deterministically only if the caller de-dups;
    callers wanting strict determinism should pre-aggregate right to one row
    per (key, ts).

    ``direction``:

    * ``"backward"`` — most recent right row with ``right_ts <= left_ts``;
    * ``"forward"`` — earliest right row with ``right_ts >= left_ts``
      (the same carry window run over descending ts; at equal ts the right
      row still sorts before the left, so the match is inclusive);
    * ``"nearest"`` — whichever of the two is closer in absolute time,
      ties going backward (matches ``pandas.merge_asof``). Both carries are
      windows over the SAME key partitioning, so Catalyst reuses one
      exchange and only adds a second sort — still a single shuffle.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'"
        )
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__left"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
            for c in right_value_cols
        ],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w_back = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        carried = unioned.select(
            "__side",
            "__left",
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True)
                .over(w)
                .alias(f"__r_{c}")
                for c in right_value_cols
            ],
        ).filter(F.col("__side") == 1)
        return carried.select(
            *[F.col(f"__left.{c}").alias(c) for c in lcols],
            *[F.col(f"__r_{c}").alias(f"{c}_asof") for c in right_value_cols],
        )
    # nearest: carry (value, match_ts) both ways, pick the closer per row
    carried = unioned.select(
        "__side",
        "__left",
        F.col("__ts"),
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w_back).alias("__b_ts"),
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w_fwd).alias("__f_ts"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True)
            .over(w_back)
            .alias(f"__b_{c}")
            for c in right_value_cols
        ],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True)
            .over(w_fwd)
            .alias(f"__f_{c}")
            for c in right_value_cols
        ],
    ).filter(F.col("__side") == 1)
    ts_d = epoch_seconds(F.col("__ts"))
    take_back = F.col("__f_ts").isNull() | (
        F.col("__b_ts").isNotNull()
        & ((ts_d - epoch_seconds(F.col("__b_ts")))
           <= (epoch_seconds(F.col("__f_ts")) - ts_d))
    )
    return carried.select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        *[
            F.when(take_back, F.col(f"__b_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(f"{c}_asof")
            for c in right_value_cols
        ],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the (large, skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side once per bucket,
    so a hot key's rows spread over ``salt_buckets`` tasks instead of one
    straggler.

    This is the manual fallback for engines/stages where AQE skew-split
    can't kick in (e.g. a skewed key feeding a stateful op). Cost: the
    right side is duplicated ``salt_buckets``× through the shuffle — use
    only when right is much smaller than the hot key's row count.
    ``how`` must be inner/left (right-side semantics would change under
    replication)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    if "__salt" in left.columns or "__salt" in right.columns:
        # a pre-existing __salt would make the join key ambiguous on the
        # left and be silently destroyed on the right by the final drop
        raise ValueError("inputs must not already carry a '__salt' column")
    # salt must be DETERMINISTIC per row: monotonically_increasing_id (or
    # rand) changes on shuffle-stage retry, losing/duplicating rows
    # (SPARK-23207 class). Hashing the whole row keeps re-executed tasks
    # bit-identical; distinct rows under a hot key still spread uniformly.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = l_salted.join(r_salted, [key, "__salt"], how)
    return out.drop("__salt")


def banded_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    band_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Scalable point-in-interval join (``start <= point <= end``,
    inclusive): the 100 TB spelling of the range join. A naive non-equi
    join between two LARGE frames plans BroadcastNestedLoopJoin — O(n·m)
    comparisons and a broadcast of one whole side (fine only for the
    literal-dim theta joins elsewhere in this repo). Here both sides are
    BANDED on ``floor(epoch/band_seconds)`` and equi-joined on the band
    key with the interval membership as a residual filter — a plain
    hash/sort-merge join Catalyst and AQE can shuffle, broadcast, or
    skew-split like any other (plan-gated: never a nested loop, never a
    cartesian product). This is the bin-bucketing strategy behind
    warehouse range-join hints, expressed with stock operators.

    Each interval replicates into ``(len // band_seconds) + 1`` bands, a
    point lands in exactly ONE band, and a qualifying (point, interval)
    pair meets only in the point's band — no post-join dedup needed.
    Pick ``band_seconds`` near the TYPICAL interval length: the
    replication factor stays ~2× while a band holds ~one interval-length
    of points. Degenerate inputs degrade loudly, not wrongly: a single
    interval spanning the whole timeline replicates into every band
    (cost, not correctness); NULL bounds or points match nothing (the
    residual is three-valued), mirroring the non-equi spelling exactly.

    ``how``: ``inner`` or ``left_semi`` (points that fall in ANY
    interval — the membership filter). Timestamp/date columns of either
    flavor are accepted (epoch via :func:`epoch_seconds`)."""
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "banded_interval_join supports how='inner'|'left_semi' only"
        )
    if band_seconds <= 0:
        raise ValueError("band_seconds must be positive")
    band = "__band"
    for side in (points, intervals):
        if band in side.columns:
            raise ValueError("inputs must not already carry '__band'")
    p = points.withColumn(
        band,
        F.floor(epoch_seconds(F.col(point_col)) / F.lit(band_seconds)).cast(
            "long"
        ),
    )
    s_band = F.floor(
        epoch_seconds(F.col(start_col)) / F.lit(band_seconds)
    ).cast("long")
    e_band = F.floor(
        epoch_seconds(F.col(end_col)) / F.lit(band_seconds)
    ).cast("long")
    iv = intervals.withColumn(
        band,
        F.explode(
            # NULL/inverted bounds -> empty sequence -> interval drops out
            F.when(
                F.col(start_col).isNotNull()
                & F.col(end_col).isNotNull()
                & (e_band >= s_band),
                F.sequence(s_band, e_band),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    residual = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    if how == "left_semi":
        # the residual must ride the join condition itself — a semi join
        # returns no right columns to filter on afterwards
        return p.join(
            iv, (p[band] == iv[band]) & residual, "left_semi"
        ).drop(band)
    return p.join(iv, band).filter(residual).drop(band)


def banded_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    band_seconds: int,
) -> DataFrame:
    """Scalable interval-OVERLAP join (``l_start <= r_end AND r_start <=
    l_end``, inclusive) between two large interval frames — the
    interval×interval companion of :func:`banded_interval_join`, same
    banding strategy, same plan promise (equi join on the band key,
    never a nested loop).

    Both sides explode to the bands they cover, but an overlapping pair
    shares EVERY band of its intersection — so each pair is anchored to
    exactly one band: the band of the LATER start,
    ``floor(epoch(greatest(l_start, r_start)) / band_seconds)``. If the
    intervals overlap, the later start lies inside both, hence its band
    is covered by both sides' explosions — the anchor filter keeps
    precisely one copy per qualifying pair, no distinct over wide rows.

    Contract: intervals are ``[start, end]`` with ``start <= end``;
    NULL-bounded and INVERTED (``end < start``, i.e. empty) intervals
    match nothing. Note this deliberately diverges from the raw
    ``l_start <= r_end AND r_start <= l_end`` predicate, which matches
    an inverted interval nested inside its partner — an artifact, not a
    semantic (an empty interval overlaps nothing). The two frames must
    not share column names (standard join-output contract)."""
    if band_seconds <= 0:
        raise ValueError("band_seconds must be positive")
    band = "__band"
    for side in (left, right):
        if band in side.columns:
            raise ValueError("inputs must not already carry '__band'")

    def banded(df: DataFrame, s: str, e: str) -> DataFrame:
        sb = F.floor(epoch_seconds(F.col(s)) / F.lit(band_seconds)).cast(
            "long"
        )
        eb = F.floor(epoch_seconds(F.col(e)) / F.lit(band_seconds)).cast(
            "long"
        )
        # validity gate is the BOUNDS (s <= e), not the bands (eb >= sb):
        # an INVERTED interval whose start and end fall inside the same
        # band has eb == sb, would explode anyway, and the overlap
        # residual below does not imply validity — hypothesis found the
        # escape (an inverted interval nested in a partner matched for
        # band widths wider than the inversion)
        return df.withColumn(
            band,
            F.explode(
                F.when(
                    F.col(s) <= F.col(e),  # NULL-safe: NULL -> otherwise
                    F.sequence(sb, eb),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )

    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    anchor = F.col(band) == F.floor(
        epoch_seconds(F.greatest(F.col(l_start), F.col(r_start)))
        / F.lit(band_seconds)
    ).cast("long")
    return (
        banded(left, l_start, l_end)
        .join(banded(right, r_start, r_end), band)
        .filter(overlap & anchor)
        .drop(band)
    )


def heavy_hitters(
    df: DataFrame,
    key: str,
    fraction: float = 0.01,
    seed: int = 42,
    min_share: float = 0.1,
) -> list[tuple]:
    """Detect hot join/group keys from a SAMPLE: returns ``(key_value,
    estimated_share)`` for keys holding at least ``min_share`` of the
    sampled rows. One narrow sample scan + a tiny aggregate — cost is
    O(fraction · rows) regardless of table size, so probing a 100 TB fact
    table costs a 1 TB-scan-equivalent once, not per query.

    A key with 10%+ of the table makes its shuffle partition a straggler
    that AQE can only split for JOINS (not stateful ops) — this is the
    detection half; :func:`auto_salted_join` is the decision half.

    At most ``1/min_share`` keys can clear the threshold, so the collect
    is bounded (≤10 rows at the default) no matter the key cardinality;
    the share denominator comes from a driver-side count over the
    persisted sample, NOT a global window (which would funnel every
    sampled distinct key through one task)."""
    sampled = df.sample(fraction=fraction, seed=seed).select(key).persist()
    try:
        total = sampled.count()
        if total == 0:
            return []
        counts = (
            sampled.groupBy(key)
            .count()
            .filter(F.col("count") >= min_share * total)
            .orderBy(F.col("count").desc())
        )
        return [(r[key], r["count"] / total) for r in counts.collect()]
    finally:
        sampled.unpersist()


def auto_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 8,
    sample_fraction: float = 0.01,
    skew_share: float = 0.2,
) -> DataFrame:
    """Equi-join that measures the left key distribution first and salts
    ONLY when a hot key holds ≥ ``skew_share`` of a sample — uniform
    inputs take the plain join (no right-side replication cost, Catalyst
    free to broadcast), skewed inputs take :func:`salted_join`.

    Salting has a real price (right side duplicated ``salt_buckets``×
    through the shuffle), so applying it unconditionally pessimizes the
    common case; applying it never leaves stragglers AQE can't split
    (stateful consumers, storage-partitioned reads). Measure, then
    decide — the engine's posture in one operator."""
    hot = heavy_hitters(
        left, key, fraction=sample_fraction, min_share=skew_share
    )
    if hot:
        return salted_join(
            left, right, key, how=how, salt_buckets=salt_buckets
        )
    return left.join(right, key, how)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_minutes``. Window + cumsum —
    one shuffle on the key. Streaming twin: ``F.session_window`` (W4)."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # double epoch seconds keeps sub-second precision (a long cast would
    # truncate and misjudge gaps that straddle a second boundary); NTZ-safe
    # via epoch_seconds (the fixture parquet stores naive timestamps)
    sec = epoch_seconds(F.col(ts))
    gap = sec - F.lag(sec).over(w)
    new_session = F.when(
        gap.isNull() | (gap >= gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """Ordered-funnel analysis (the ClickHouse ``windowFunnel`` shape):
    per user, how far through ``steps`` they progressed, matching each
    step to the EARLIEST event after the previous step's match — with an
    optional completion window anchored at the first step's match.

    Spark-first plan: ONE shuffle (groupBy user), then a pure-JVM
    higher-order ``aggregate`` walking the user's time-sorted event
    array with a (step, anchor_ts, last_ts) accumulator — no per-step
    self-joins (the naive funnel is ``len(steps)`` joins over the event
    table; at 100 TB that is ``len(steps)`` shuffles of the fact table
    instead of one). Per-user state is the event array: bounded by
    events-per-user, the same bound sessionization already carries.

    Greedy earliest-anchor semantics (anchor = user's FIRST step-0
    event) — identical to the sequential ``min(ts)`` SQL a warehouse
    would write, which is what the oracle twin checks.

    Returns (user, furthest_step [0 = none matched], completed bool).
    """
    sec = epoch_seconds(F.col(ts_col))
    ev = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col),
        F.struct(sec.alias("t"), F.col(type_col).alias("ty")).alias("e"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list("e")).alias("seq")
    )
    # walk state: (step reached, anchor = step-0 match time, last match
    # time). Later steps must be STRICTLY later than the previous match
    # — same-timestamp ties do not advance, matching the sequential
    # `min(ts) WHERE ts > prev` SQL a warehouse writes (the oracle twin)
    init = F.struct(
        F.lit(0).alias("step"),
        F.lit(None).cast("double").alias("t0"),
        F.lit(None).cast("double").alias("last"),
    )
    n = len(steps)
    step_of = F.array(*[F.lit(s) for s in steps])

    def advance(acc, e):
        want = F.element_at(step_of, acc["step"] + 1)  # 1-based
        after_prev = F.when(acc["step"] == 0, F.lit(True)).otherwise(
            e["t"] > acc["last"]
        )
        in_window = (
            F.lit(True)
            if within_seconds is None
            else F.when(acc["step"] == 0, F.lit(True)).otherwise(
                e["t"] <= acc["t0"] + F.lit(float(within_seconds))
            )
        )
        matches = (
            (acc["step"] < n) & (e["ty"] == want) & after_prev & in_window
        )
        return F.when(
            matches,
            F.struct(
                (acc["step"] + 1).alias("step"),
                F.when(acc["step"] == 0, e["t"])
                .otherwise(acc["t0"])
                .alias("t0"),
                e["t"].alias("last"),
            ),
        ).otherwise(acc)

    walked = per_user.select(
        user_col,
        F.aggregate("seq", init, advance).alias("acc"),
    )
    return walked.select(
        user_col,
        F.col("acc.step").alias("furthest_step"),
        (F.col("acc.step") == n).alias("completed"),
    )


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_ndv: bool = False
) -> DataFrame:
    """ANALYZE-style column profile in ONE scan: row count, null count /
    fraction, distinct-count (HLL approx by default — at 100 TB an exact
    per-column COUNT DISTINCT is its own shuffle PER COLUMN; the HLL
    sketches all ride the same single aggregation), and min/max rendered
    as strings so one long-format result covers heterogeneous types.

    Every per-column statistic is an expression in one ``agg`` — N
    columns cost one pass, not N (the same rewrite as the DQ engine's
    A2). The wide 1-row aggregate is melted to one row per column with
    an inline-explode over literal structs: an Expand over ONE row,
    no extra shuffle. Use the result to pick partition/bucket/Z-order
    columns (high-ndv keys) and to spot null-heavy or constant columns
    before they ship to training."""
    from pyspark.sql.types import DataType, MapType

    def _unorderable(dt: DataType) -> bool:
        # maps have no ordering (min/max/distinct all reject them);
        # nested fields inherit the problem
        return any(isinstance(t, MapType) for t in _walk_types(dt))

    def _walk_types(dt: DataType):
        yield dt
        for child in getattr(dt, "fields", []):
            yield from _walk_types(child.dataType)
        for attr in ("elementType", "valueType", "keyType"):
            if hasattr(dt, attr):
                yield from _walk_types(getattr(dt, attr))

    cols = columns or df.columns
    types = dict(zip(df.schema.names, [f.dataType for f in df.schema]))
    ndv = F.count_distinct if exact_ndv else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if _unorderable(types[c]):
            # null/row stats still profile; order-dependent stats are
            # honestly NULL instead of failing the whole table
            aggs += [
                F.max(F.lit(None).cast("bigint")).alias(f"__ndv_{c}"),
                F.max(F.lit(None).cast("string")).alias(f"__min_{c}"),
                F.max(F.lit(None).cast("string")).alias(f"__max_{c}"),
            ]
        else:
            aggs += [
                ndv(F.col(c)).alias(f"__ndv_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.round(
                    (F.col("__n") - F.col(f"__nn_{c}"))
                    / F.greatest(F.col("__n"), F.lit(1)),
                    6,
                ).alias("null_frac"),
                F.col(f"__ndv_{c}").alias("ndv"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(entries))
