"""Operator-library semantics: salted join equivalence, as-of join edge
cases, top-k determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import ops


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail — the shape salting exists for
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("k950", 2.0), ("missing", 3.0)], "k string, w double"
    )
    return left, right


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "inner").select("k", "v", "w")
    salted = ops.salted_join(left, right, "k", "inner").select("k", "v", "w")
    assert canon(salted) == canon(plain)
    assert plain.count() == 901  # hot 900 + k950


def test_salted_join_matches_plain_left(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "left").select("k", "v", "w")
    salted = ops.salted_join(left, right, "k", "left").select("k", "v", "w")
    assert canon(salted) == canon(plain)


def test_salted_join_rejects_right_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        ops.salted_join(left, right, "k", "right")


def test_salted_join_rejects_preexisting_salt_column(spark, skewed):
    """Round-3 advisory: a caller-owned __salt column would make the join
    key ambiguous (left) or be silently dropped (right) — refuse loudly."""
    left, right = skewed
    with pytest.raises(ValueError, match="__salt"):
        ops.salted_join(left.withColumn("__salt", F.lit(0)), right, "k")
    with pytest.raises(ValueError, match="__salt"):
        ops.salted_join(left, right.withColumn("__salt", F.lit(0)), "k")


def test_asof_join_forward_and_nearest(spark):
    """Directions: forward picks the earliest right at-or-after, nearest
    picks the closer side with ties going backward."""
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 95, "b"), (1, 300, "c")], "k long, ts long, ev string"
    )
    right = spark.createDataFrame(
        [(1, 50, 5.0), (1, 100, 7.0)], "k long, ts long, v double"
    )
    fwd = {
        r.ev: r.v_asof
        for r in ops.asof_join(
            left, right, "k", "ts", "ts", ["v"], direction="forward"
        ).collect()
    }
    assert fwd == {"a": 5.0, "b": 7.0, "c": None}
    near = {
        r.ev: r.v_asof
        for r in ops.asof_join(
            left, right, "k", "ts", "ts", ["v"], direction="nearest"
        ).collect()
    }
    # ts=95: backward gap 45, forward gap 5 → forward wins; ts=300 → backward
    assert near == {"a": 5.0, "b": 7.0, "c": 7.0}


def test_asof_join_no_match_yields_null(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (2, 50, "b")], "k long, ts long, ev string"
    )
    right = spark.createDataFrame([(1, 60, 9.0), (2, 70, 8.0)], "k long, ts long, v double")
    out = ops.asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    by_ev = {r.ev: r.v_asof for r in out}
    assert by_ev == {"a": 9.0, "b": None}  # b's only right row is later


def test_asof_join_same_ts_visible(spark):
    left = spark.createDataFrame([(1, 60, "a")], "k long, ts long, ev string")
    right = spark.createDataFrame([(1, 60, 5.0)], "k long, ts long, v double")
    out = ops.asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    assert out[0].v_asof == 5.0


def test_topk_per_group_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 10.0), ("g", 3, 10.0)], "grp string, id int, score double"
    )
    top = ops.topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id").asc()], k=2
    )
    assert [r.id for r in top.orderBy("rn").collect()] == [1, 2]


def test_spread_repartitions_small_input_only(spark):
    """spread() widens a 1-partition input to default parallelism but must
    be a NO-OP when the input is already parallel (no extra shuffle at
    scale)."""
    from realtime_data_pipeline_spark.ops import spread

    target = spark.sparkContext.defaultParallelism
    small = spark.range(0, 1000, 1, 1)
    assert spread(small).rdd.getNumPartitions() == target
    wide = spark.range(0, 1000, 1, target)
    assert spread(wide) is wide


def test_heavy_hitters_detects_hot_key(spark):
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import ops

    # 80% of rows on key 7, the rest uniform over 1000 keys
    df = spark.range(0, 20_000, 1, 8).select(
        F.when(F.pmod("id", F.lit(10)) < 8, F.lit(7))
        .otherwise(F.pmod("id", F.lit(1000)))
        .alias("k")
    )
    hot = ops.heavy_hitters(df, "k", fraction=0.1, min_share=0.1)
    assert [k for k, _ in hot] == [7]
    assert hot[0][1] > 0.5


def test_heavy_hitters_uniform_input_empty(spark):
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import ops

    df = spark.range(0, 20_000, 1, 8).select(F.pmod("id", F.lit(500)).alias("k"))
    assert ops.heavy_hitters(df, "k", fraction=0.1, min_share=0.1) == []


def test_auto_salted_join_salts_only_when_skewed(spark):
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import ops

    skewed = spark.range(0, 20_000, 1, 8).select(
        F.when(F.pmod("id", F.lit(10)) < 8, F.lit(3))
        .otherwise(F.pmod("id", F.lit(100)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )
    uniform = spark.range(0, 20_000, 1, 8).select(
        F.pmod("id", F.lit(100)).cast("long").alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 2).alias("w")
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j_skew = ops.auto_salted_join(skewed, dim, "k")
        plan_skew = j_skew._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan_skew, "skewed input must take the salted path"
        assert j_skew.count() == skewed.count()

        j_uni = ops.auto_salted_join(uniform, dim, "k")
        plan_uni = j_uni._jdf.queryExecution().executedPlan().toString()
        assert "__salt" not in plan_uni, "uniform input must join plainly"
        assert j_uni.count() == uniform.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_heavy_hitters_empty_input(spark):
    from realtime_data_pipeline_spark import ops

    empty = spark.createDataFrame([], "k long")
    assert ops.heavy_hitters(empty, "k", fraction=0.5) == []


def test_funnel_steps_strict_order_and_window(spark):
    """Funnel walk semantics: steps must be strictly later than the
    previous match (same-timestamp ties don't advance), the completion
    window anchors at the FIRST step-0 event (greedy, not best-start),
    and off-path events are ignored."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import ops

    rows = [
        # u1: clean A->B->C inside the hour
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:10:00", "click"),
        (1, "2024-01-01 10:20:00", "purchase"),
        # u2: click at the SAME ts as view -> must NOT advance past view;
        # later click advances, purchase outside the hour -> step 2
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:00:00", "click"),
        (2, "2024-01-01 10:30:00", "click"),
        (2, "2024-01-01 11:30:00", "purchase"),
        # u3: anchor is the FIRST view (09:00, window closes 10:00); the
        # chain after the SECOND view falls outside it -> greedy stops at
        # step 1 (a best-start search would find 3 — not this semantic,
        # and not the sequential-min SQL the oracle twin runs)
        (3, "2024-01-01 09:00:00", "view"),
        (3, "2024-01-01 11:00:00", "view"),
        (3, "2024-01-01 11:10:00", "click"),
        (3, "2024-01-01 11:20:00", "purchase"),
        # u4: steps out of order -> only the view counts
        (4, "2024-01-01 10:05:00", "purchase"),
        (4, "2024-01-01 10:06:00", "view"),
        # u5: no funnel events at all -> absent from output
        (5, "2024-01-01 10:00:00", "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.user_id: (r.furthest_step, r.completed)
        for r in ops.funnel_steps(
            df, "user_id", "ts", "event_type",
            steps=["view", "click", "purchase"], within_seconds=3600.0,
        ).collect()
    }
    assert out == {
        1: (3, True),
        2: (2, False),
        3: (1, False),
        4: (1, False),
    }


def test_profile_table_one_scan_exact_stats(spark):
    """Column profile: exact stats verified per column, and ALL columns'
    statistics ride ONE scan + ONE aggregation (N columns != N passes)."""
    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 1.5),
            (3, "b", 2.5),
            (4, None, 2.5),
        ],
        "id long, s string, v double",
    )
    prof = {
        r.column: r
        for r in ops.profile_table(df, exact_ndv=True).collect()
    }
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"].n_rows == 4 and prof["id"].n_nulls == 0
    assert prof["id"].ndv == 4
    assert (prof["id"].min_value, prof["id"].max_value) == ("1", "4")
    assert prof["s"].n_nulls == 1 and prof["s"].ndv == 2
    assert prof["v"].null_frac == 0.25
    assert (prof["v"].min_value, prof["v"].max_value) == ("1.5", "2.5")

    from tests.test_plans import plan_str

    plan = plan_str(ops.profile_table(df), mode="simple")
    assert plan.count("Scan ") == 1
    # one partial+final aggregate pair -> a single exchange
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1


def test_profile_table_approx_ndv_tracks_exact(spark):
    """Default HLL distinct counts stay within the sketch's documented
    error on a 10k-row column."""
    df = spark.range(10_000).selectExpr("id", "id % 97 AS mod97")
    prof = {r.column: r for r in ops.profile_table(df).collect()}
    assert abs(prof["mod97"].ndv - 97) / 97 < 0.1
    assert abs(prof["id"].ndv - 10_000) / 10_000 < 0.1


def test_profile_table_tolerates_map_columns(spark):
    """Map columns have no ordering: rows/nulls still profile, the
    order-dependent stats go NULL instead of failing the whole table."""
    df = spark.createDataFrame(
        [(1, {"a": "x"}), (2, None)], "id long, attrs map<string,string>"
    )
    prof = {r.column: r for r in ops.profile_table(df).collect()}
    assert prof["attrs"].n_nulls == 1
    assert prof["attrs"].ndv is None
    assert prof["attrs"].min_value is None
    assert prof["id"].ndv == 2


@pytest.mark.slow
def test_banded_interval_join_matches_nonequi_spelling(spark):
    """banded_interval_join must equal the naive non-equi join exactly:
    inclusive endpoints, intervals spanning many bands, points on band
    boundaries, NULL bounds/points matching nothing, inverted intervals
    empty. Deterministic pseudo-random inputs."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # 200 points over ~60 days; 20 intervals of wildly varying length
    points = spark.createDataFrame(
        [
            (i, base + dt.timedelta(hours=(i * 7919) % 1440))
            for i in range(200)
        ]
        + [(900, None)],
        "pid long, ts timestamp",
    )
    ivs = []
    for j in range(20):
        s = base + dt.timedelta(hours=(j * 4271) % 1200)
        ivs.append((j, s, s + dt.timedelta(hours=(j * 37) % 400)))
    ivs += [(800, None, base), (801, base, None),
            (802, base + dt.timedelta(days=9), base)]  # inverted
    intervals = spark.createDataFrame(
        ivs, "iid long, s timestamp, e timestamp"
    )

    got = ops.banded_interval_join(
        points, intervals, "ts", "s", "e", band_seconds=86400
    ).select("pid", "iid")
    naive = points.join(
        intervals,
        (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")),
    ).select("pid", "iid")
    g = {(r.pid, r.iid) for r in got.collect()}
    n = {(r.pid, r.iid) for r in naive.collect()}
    assert g == n and len(g) > 0

    # left_semi: points inside ANY interval, each once
    semi = ops.banded_interval_join(
        points, intervals, "ts", "s", "e", band_seconds=86400,
        how="left_semi",
    )
    assert {r.pid for r in semi.collect()} == {p for p, _ in n}
    assert semi.count() == len({p for p, _ in n})

    # inclusive boundaries, interval spanning multiple narrow bands
    pts2 = spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(days=5))],
        "pid long, ts timestamp",
    )
    iv2 = spark.createDataFrame(
        [(1, base, base + dt.timedelta(days=5))],
        "iid long, s timestamp, e timestamp",
    )
    got2 = ops.banded_interval_join(
        pts2, iv2, "ts", "s", "e", band_seconds=3600
    )
    assert got2.count() == 2  # both endpoints match despite 120 bands

    import pytest

    with pytest.raises(ValueError, match="__band"):
        ops.banded_interval_join(
            points.withColumn("__band", F.lit(1)), intervals,
            "ts", "s", "e", band_seconds=60,
        )
    with pytest.raises(ValueError, match="positive"):
        ops.banded_interval_join(
            points, intervals, "ts", "s", "e", band_seconds=0
        )


def test_banded_interval_join_plans_hash_join_not_nested_loop(spark):
    """The whole point of the banding: two large sides must plan an
    EQUI join on the band key (hash or sort-merge), never a
    BroadcastNestedLoopJoin or CartesianProduct."""
    import datetime as dt

    from tests.test_plans import plan_str

    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i)) for i in range(100)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (j, base + dt.timedelta(minutes=3 * j),
             base + dt.timedelta(minutes=3 * j + 10))
            for j in range(50)
        ],
        "iid long, s timestamp, e timestamp",
    )
    # disable auto-broadcast so the gate proves the SHUFFLED equi path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_str(
            ops.banded_interval_join(
                points, intervals, "ts", "s", "e", band_seconds=600
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


@pytest.mark.slow
def test_banded_overlap_join_matches_nonequi_spelling(spark):
    """banded_overlap_join must equal the naive overlap join exactly,
    with each qualifying pair emitted ONCE (the anchor-band rule) even
    when the pair shares many bands; NULL/inverted intervals match
    nothing."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    lft = spark.createDataFrame(
        [
            (i, base + dt.timedelta(hours=(i * 311) % 700),
             base + dt.timedelta(hours=(i * 311) % 700 + (i * 13) % 90))
            for i in range(40)
        ]
        + [(900, None, base), (901, base + dt.timedelta(days=2), base)],
        "lid long, ls timestamp, le timestamp",
    )
    rgt = spark.createDataFrame(
        [
            (j, base + dt.timedelta(hours=(j * 457) % 700),
             base + dt.timedelta(hours=(j * 457) % 700 + (j * 29) % 120))
            for j in range(40)
        ],
        "rid long, rs timestamp, re timestamp",
    )
    got = ops.banded_overlap_join(
        lft, rgt, "ls", "le", "rs", "re", band_seconds=6 * 3600
    ).select("lid", "rid")
    naive = lft.join(
        rgt,
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
    ).select("lid", "rid")
    g = [(r.lid, r.rid) for r in got.collect()]
    n = {(r.lid, r.rid) for r in naive.collect()}
    assert set(g) == n and len(g) > 0
    assert len(g) == len(n)  # exactly-once per pair, no band duplicates

    # long intervals sharing MANY narrow bands still emit one row
    big_l = spark.createDataFrame(
        [(1, base, base + dt.timedelta(days=30))],
        "lid long, ls timestamp, le timestamp",
    )
    big_r = spark.createDataFrame(
        [(2, base + dt.timedelta(days=1), base + dt.timedelta(days=29))],
        "rid long, rs timestamp, re timestamp",
    )
    assert (
        ops.banded_overlap_join(
            big_l, big_r, "ls", "le", "rs", "re", band_seconds=3600
        ).count()
        == 1
    )
