"""Count-min sketch (sketches.py): one-sided error bound, exact merge
semantics, zero-for-unseen queries, and the no-UDF/no-collect plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark import sketches
import pytest


def skewed_df(spark):
    # key k appears (k+1) * 10 times for k in 0..9, plus a heavy hitter
    rows = [(f"k{k}",) for k in range(10) for _ in range((k + 1) * 10)]
    rows += [("hot",)] * 500
    return spark.createDataFrame(rows, "key string")


def test_estimates_are_one_sided_and_tight_at_low_load(spark):
    df = skewed_df(spark)
    sk = sketches.countmin_build(df, "key", depth=5, width=256)
    true = {r.key: r.n for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}
    est = {
        r.key: r.est_count
        for r in sketches.countmin_query(sk, df, "key").collect()
    }
    n_total = sum(true.values())
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)  # never undercounts
        # 11 distinct keys in 256 buckets x 5 depths: collisions are
        # overwhelmingly unlikely to survive the min across depths
        assert est[k] <= t + 0.05 * n_total, (k, est[k], t)
    assert est["hot"] == 500  # the heavy hitter reads exact here


def test_merge_equals_sketch_of_union_exactly(spark):
    df = skewed_df(spark)
    a = df.filter(F.crc32("key") % 2 == 0)
    b = df.filter(F.crc32("key") % 2 == 1)
    merged = sketches.countmin_merge(
        sketches.countmin_build(a, "key", depth=3, width=64),
        sketches.countmin_build(b, "key", depth=3, width=64),
    )
    whole = sketches.countmin_build(df, "key", depth=3, width=64)
    as_rows = lambda s: sorted(  # noqa: E731
        (r["__depth"], r["__bucket"], r.n) for r in s.collect()
    )
    assert as_rows(merged) == as_rows(whole)


def test_unseen_key_estimates_zero_or_collision(spark):
    df = skewed_df(spark)
    sk = sketches.countmin_build(df, "key", depth=5, width=512)
    probes = spark.createDataFrame([("never-seen",)], "key string")
    est = sketches.countmin_query(sk, probes, "key").collect()
    assert est[0].est_count == 0  # absent (d, b) pairs read as 0


def test_plan_is_udf_free_and_collect_free(spark):
    from tests.test_plans import plan_str

    df = skewed_df(spark)
    sk = sketches.countmin_build(df, "key", depth=3, width=64)
    plan = plan_str(
        sketches.countmin_query(sk, df, "key"), mode="simple"
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the sketch rides broadcast


def test_empty_sketch_estimates_zero_and_mixed_geometry_rejected(spark):
    import pytest as _pytest

    empty = sketches.countmin_build(
        spark.createDataFrame([], "key string"), "key", depth=3, width=64
    )
    probes = spark.createDataFrame([("x",)], "key string")
    got = sketches.countmin_query(empty, probes, "key").collect()
    assert got[0].est_count == 0
    a = sketches.countmin_build(skewed_df(spark), "key", depth=3, width=64)
    b = sketches.countmin_build(skewed_df(spark), "key", depth=3, width=128)
    with _pytest.raises(ValueError, match="geometries"):
        sketches.countmin_query(
            sketches.countmin_merge(a, b), probes, "key"
        ).collect()


def test_histogram_quantiles_within_one_bin_and_merge_exact(spark):
    """Histogram sketch: quantile estimates land within one bin width of
    the exact percentiles, and merge ≡ histogram-of-union exactly (the
    partial contract)."""
    df = spark.range(10_000).selectExpr("CAST(id AS DOUBLE) AS x")
    h = sketches.histogram_build(df, "x", lo=0.0, hi=10_000.0, bins=200)
    est = {
        r.q: r.estimate
        for r in sketches.histogram_quantile(h, [0.1, 0.5, 0.9]).collect()
    }
    binw = 10_000.0 / 200
    for q, true in [(0.1, 1000.0), (0.5, 5000.0), (0.9, 9000.0)]:
        assert abs(est[q] - true) <= binw, (q, est[q], true)

    a = df.filter("x < 3000")
    b = df.filter("x >= 3000")
    merged = sketches.histogram_merge(
        sketches.histogram_build(a, "x", 0.0, 10_000.0, 200),
        sketches.histogram_build(b, "x", 0.0, 10_000.0, 200),
    )
    whole = sketches.histogram_build(df, "x", 0.0, 10_000.0, 200)
    rows = lambda hh: sorted(  # noqa: E731
        (r["__bin"], r.n) for r in hh.collect()
    )
    assert rows(merged) == rows(whole)

    import pytest as _pytest

    other = sketches.histogram_build(df, "x", 0.0, 5_000.0, 200)
    with _pytest.raises(ValueError, match="geometries"):
        sketches.histogram_quantile(
            sketches.histogram_merge(whole, other), [0.5]
        ).collect()

    # degenerate geometry fails loudly at build time, not as a silent
    # all-in-bin-0 histogram whose quantiles all read lo (round-5 advice)
    with _pytest.raises(ValueError, match="lo < hi"):
        sketches.histogram_build(df, "x", lo=5.0, hi=5.0, bins=10)
    with _pytest.raises(ValueError, match="bins >= 1"):
        sketches.histogram_build(df, "x", lo=0.0, hi=1.0, bins=0)


def test_sketch_partials_stream_and_merge_on_read(spark, tmp_path):
    """The streaming-partial wiring: each micro-batch writes its own
    count-min partial under batch_id=N (same discipline as the
    continuous rollup); the merged view over ALL partials equals the
    batch sketch of the full stream — no state store, replay-safe by
    dynamic partition overwrite."""
    import os

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import streaming

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    batches = [[("a",), ("b",), ("a",)], [("a",), ("c",)]]
    for i, rows in enumerate(batches):
        with open(os.path.join(inbox, f"b{i}.csv"), "w") as f:
            f.write("key\n")
            for (k,) in rows:
                f.write(k + "\n")
        os.utime(inbox + f"/b{i}.csv", (1_700_000_000 + i,) * 2)

    out = str(tmp_path / "cm_partials")

    def write_partial(batch_df, batch_id):
        (
            sketches.countmin_build(batch_df, "key", depth=3, width=64)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    q = (
        streaming.read_file_stream(
            spark, inbox, "key string", max_files_per_trigger=1
        )
        .writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = sketches.countmin_merge(spark.read.parquet(out).drop("batch_id"))
    whole = sketches.countmin_build(
        spark.createDataFrame(
            [r for b in batches for r in b], "key string"
        ),
        "key",
        depth=3,
        width=64,
    )
    assert sorted(
        (r["__depth"], r["__bucket"], r.n) for r in merged.collect()
    ) == sorted((r["__depth"], r["__bucket"], r.n) for r in whole.collect())
    probes = spark.createDataFrame([("a",), ("c",), ("z",)], "key string")
    est = {
        r.key: r.est_count
        for r in sketches.countmin_query(merged, probes, "key").collect()
    }
    assert est == {"a": 3, "c": 1, "z": 0}


# --- bloom filter sketch ---------------------------------------------------


def _keys(spark, vals, typ="long"):
    return spark.createDataFrame([(v,) for v in vals], f"k {typ}")


def test_bloom_merge_equals_bloom_of_union_exactly(spark):
    a = _keys(spark, range(0, 500))
    b = _keys(spark, range(300, 900))
    merged = sketches.bloom_merge(
        sketches.bloom_build(a, "k", expected_items=1000),
        sketches.bloom_build(b, "k", expected_items=1000),
    )
    union = sketches.bloom_build(
        a.unionByName(b), "k", expected_items=1000
    )
    rows = lambda df: sorted(
        (r["__word"], r["__bits"], r["__m"], r["__k"])
        for r in df.collect()
    )
    assert rows(merged) == rows(union)


def test_bloom_prefilter_join_equivalence_and_pruning(spark):
    # big side: 5000 keys; small side: 100 of them plus 50 foreign keys
    big = _keys(spark, range(5000)).withColumn("v", F.col("k") * 2)
    small = _keys(spark, list(range(0, 1000, 10)) + list(range(9000, 9050)))
    bloom = sketches.bloom_build(small, "k", expected_items=200)
    pre = sketches.bloom_prefilter(big, "k", bloom)
    # no false negatives: prefilter + exact join == plain join
    exact = sorted(
        (r.k, r.v) for r in big.join(small.distinct(), "k").collect()
    )
    via_pre = sorted(
        (r.k, r.v) for r in pre.join(small.distinct(), "k").collect()
    )
    assert via_pre == exact and len(exact) == 100
    # and it actually prunes: kept ~ matches + fp, far below the 5000
    kept = pre.count()
    assert 100 <= kept < 500, kept


def test_bloom_prefilter_string_keys_and_nulls(spark):
    big = spark.createDataFrame(
        [("a",), ("b",), ("zz",), (None,)], "k string"
    )
    small = spark.createDataFrame([("a",), (None,)], "k string")
    bloom = sketches.bloom_build(small, "k", expected_items=10)
    kept = {r.k for r in sketches.bloom_prefilter(big, "k", bloom).collect()}
    # NULL keys never survive (equality can't match them) on either side
    assert "a" in kept and None not in kept


def test_bloom_prefilter_empty_sketch_and_geometry_guards(spark):
    import pytest

    big = _keys(spark, range(100))
    empty = sketches.bloom_build(
        big.filter(F.lit(False)), "k", expected_items=10
    )
    assert sketches.bloom_prefilter(big, "k", empty).count() == 0
    mixed = sketches.bloom_merge(
        sketches.bloom_build(big, "k", expected_items=10),
        sketches.bloom_build(big, "k", expected_items=100000),
    )
    with pytest.raises(ValueError, match="mixes geometries"):
        sketches.bloom_prefilter(big, "k", mixed)
    with pytest.raises(ValueError, match="expected_items"):
        sketches.bloom_build(big, "k", expected_items=0)
    with pytest.raises(ValueError, match="fpp"):
        sketches.bloom_build(big, "k", expected_items=10, fpp=1.5)


def test_bloom_probe_is_jvm_side_broadcast(spark):
    """The prefilter's hot path must be column expressions inside the
    scan stage: a 1-row broadcast carrying the bitmap, xxhash64/getbit
    bit tests, and NO Python evaluation node."""
    big = _keys(spark, range(2000))
    bloom = sketches.bloom_build(
        _keys(spark, range(0, 100)), "k", expected_items=100
    )
    plan = (
        sketches.bloom_prefilter(big, "k", bloom)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan, plan
    assert "Broadcast" in plan, plan


def test_bloom_prefilter_refuses_v1_sketch(spark):
    """A persisted pre-v2 sketch (k independent hash positions, no __v
    column) must be REJECTED loudly: its bits sit at different
    positions than the v2 double-hashed probe computes, so probing it
    would silently drop true members — the one failure mode a bloom
    prefilter must never have."""
    import pytest

    big = _keys(spark, range(100))
    v1 = sketches.bloom_build(big, "k", expected_items=100).drop("__v")
    with pytest.raises(ValueError, match="format v2"):
        sketches.bloom_prefilter(big, "k", v1)


def test_bloom_probe_plan_has_two_hashes_not_k(spark):
    """The v2 probe's plan must contain exactly the 2 xxhash64 calls of
    double hashing (k derived positions are add/mod arithmetic) — the
    round-9 fix for the probe costing more than the shuffle it saves.
    k > 2 for this geometry, so a regression to per-seed hashing would
    reintroduce k calls."""
    big = _keys(spark, range(1000))
    bloom = sketches.bloom_build(big, "k", expected_items=1000, fpp=0.01)
    geo = bloom.select("__k").first()
    assert int(geo["__k"]) > 2  # the assertion below is vacuous otherwise
    plan = (
        sketches.bloom_prefilter(big, "k", bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the k bit-tests live in the join condition; they must reference
    # the __a/__b attributes, never re-evaluate the hash (AQE's
    # toString may print the plan twice, so assert per line)
    for line in plan.splitlines():
        if "xxhash64" in line:
            assert "Project" in line, line
            assert line.count("xxhash64") == 2, line
        if "Join" in line:
            assert "xxhash64" not in line, line


def test_misra_gries_guarantee_and_lower_bounds(spark):
    """Every item with true frequency > N/(k+1) must survive, and each
    reported lb must be a certified lower bound within N/(k+1) of the
    true count — the classic MG contract, checked against exact counts
    on a skewed input across several partition layouts."""
    df = skewed_df(spark)  # N = 1050, hot=500, k9=100, ..., k0=10
    exact = {r["key"]: r["n"] for r in
             df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(exact.values())
    for parts in (1, 4, 32):
        k = 8
        got = {
            r["item"]: r["lb"]
            for r in sketches.misra_gries_topk(
                df.repartition(parts), "key", k
            ).collect()
        }
        assert len(got) <= k
        slack = n_total / (k + 1)
        for item, true_n in exact.items():
            if true_n > slack:
                assert item in got, (parts, item, true_n, slack)
        for item, lb in got.items():
            assert lb <= exact[item], (item, lb, exact[item])
            assert exact[item] - lb <= slack + 1e-9


@pytest.mark.slow
def test_misra_gries_merge_matches_single_partition_candidates(spark):
    """Merging per-partition summaries keeps the guarantee of a summary
    built in one pass: the merged candidate set must contain every item
    the single-partition (exact-path) summary certifies above slack."""
    df = skewed_df(spark)
    k = 5
    single = {
        r["item"]
        for r in sketches.misra_gries_topk(
            df.coalesce(1), "key", k
        ).collect()
        if r["lb"] > 1050 / (k + 1)
    }
    merged = sketches.misra_gries_merge(
        sketches.misra_gries_partials(df.repartition(8), "key", k)
    )
    got = {r["item"] for r in merged.collect()}
    assert single <= got
    # mixed-k summaries are rejected
    import pytest as _pytest

    a = sketches.misra_gries_partials(df, "key", 4)
    b = sketches.misra_gries_partials(df, "key", 6)
    with _pytest.raises(ValueError, match="different k"):
        sketches.misra_gries_merge(a, b).collect()


def test_misra_gries_nulls_ignored_and_long_keys(spark):
    """NULL keys are dropped (documented contrast with count-min), and
    the summary schema follows the input column type (longs stay
    longs)."""
    rows = [(1,)] * 50 + [(2,)] * 5 + [(None,)] * 20
    df = spark.createDataFrame(rows, "key long")
    got = sketches.misra_gries_topk(df, "key", 2).collect()
    items = {r["item"] for r in got}
    assert None not in items
    assert 1 in items
    assert all(isinstance(r["item"], int) for r in got)


def test_mg_partials_stream_and_merge_on_read(spark, tmp_path):
    """Misra-Gries rides the same streaming-partial wiring as count-min:
    each micro-batch writes its own <= k-row summary under batch_id=N,
    and the merge-on-read view keeps the survival guarantee for the
    WHOLE stream — heavy-hitter discovery over an unbounded stream with
    k rows of state per batch and no state store."""
    import os

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import streaming

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    batches = [
        [("hot",)] * 30 + [("a",), ("b",)],
        [("hot",)] * 20 + [("c",)] * 8 + [("d",)],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(inbox, f"b{i}.csv"), "w") as f:
            f.write("key\n")
            for (k,) in rows:
                f.write(k + "\n")
        os.utime(inbox + f"/b{i}.csv", (1_700_000_000 + i,) * 2)

    out = str(tmp_path / "mg_partials")

    def write_partial(batch_df, batch_id):
        (
            sketches.misra_gries_partials(batch_df, "key", k=3)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    q = (
        streaming.read_file_stream(
            spark, inbox, "key string", max_files_per_trigger=1
        )
        .writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = sketches.misra_gries_merge(
        spark.read.parquet(out).drop("batch_id")
    )
    got = {r["item"]: r["lb"] for r in merged.collect()}
    all_rows = [r for b in batches for r in b]
    n_total = len(all_rows)
    exact = {}
    for (k,) in all_rows:
        exact[k] = exact.get(k, 0) + 1
    slack = n_total / 4  # k=3
    for item, true_n in exact.items():
        if true_n > slack:
            assert item in got, (item, true_n, slack)
    for item, lb in got.items():
        assert lb <= exact[item]


def test_countmin_join_size_one_sided_and_tight(spark):
    """Inner-product join-size estimate: ALWAYS >= the true equi-join
    cardinality (collision cross-terms are nonnegative), and tight at
    low load (width >> distinct keys => no collisions => exact)."""
    import random

    rng = random.Random(3)
    a_keys = [rng.randint(0, 50) for _ in range(600)]
    b_keys = [rng.randint(25, 75) for _ in range(400)]
    a = spark.createDataFrame([(k,) for k in a_keys], "k long")
    b = spark.createDataFrame([(k,) for k in b_keys], "k long")
    true_size = a.join(b, "k").count()

    sa = sketches.countmin_build(a, "k", depth=5, width=2048)
    sb = sketches.countmin_build(b, "k", depth=5, width=2048)
    est = sketches.countmin_join_size(sa, sb).first()["est_join_rows"]
    assert est == true_size  # low load: exact

    # heavy load (width << keys): still one-sided
    sa2 = sketches.countmin_build(a, "k", depth=3, width=8)
    sb2 = sketches.countmin_build(b, "k", depth=3, width=8)
    est2 = sketches.countmin_join_size(sa2, sb2).first()["est_join_rows"]
    assert est2 >= true_size


def test_countmin_join_size_disjoint_empty_and_geometry_guard(spark):
    """Disjoint key sets estimate 0 even when only SOME depths lose all
    bucket overlap; an empty side estimates 0; mismatched geometries
    are rejected."""
    import pytest

    a = spark.createDataFrame([(i,) for i in range(20)], "k long")
    b = spark.createDataFrame([(i + 10_000,) for i in range(20)], "k long")
    sa = sketches.countmin_build(a, "k", depth=4, width=4096)
    sb = sketches.countmin_build(b, "k", depth=4, width=4096)
    est = sketches.countmin_join_size(sa, sb).first()["est_join_rows"]
    # wide geometry: disjoint keys share no buckets in at least one depth
    assert est == 0

    empty = sketches.countmin_build(
        spark.createDataFrame([], "k long"), "k", depth=4, width=4096
    )
    assert (
        sketches.countmin_join_size(sa, empty).first()["est_join_rows"] == 0
    )

    other = sketches.countmin_build(a, "k", depth=4, width=1024)
    with pytest.raises(ValueError, match="geometry"):
        sketches.countmin_join_size(sa, other)


def test_countmin_join_size_respects_multiplicities(spark):
    """Join size is sum f_a(k)*f_b(k), NOT distinct-key overlap: skewed
    multiplicities must multiply through."""
    a = spark.createDataFrame([(1,)] * 30 + [(2,)] * 5, "k long")
    b = spark.createDataFrame([(1,)] * 7 + [(3,)] * 9, "k long")
    sa = sketches.countmin_build(a, "k", depth=5, width=1024)
    sb = sketches.countmin_build(b, "k", depth=5, width=1024)
    est = sketches.countmin_join_size(sa, sb).first()["est_join_rows"]
    assert est == 30 * 7


def test_countmin_self_join_size_is_f2_skew_signal(spark):
    """join_size(s, s) estimates F2 = sum f(k)^2 — the second frequency
    moment, the skew signal behind salt-or-not decisions (uniform keys
    minimize F2 at N^2/distinct; a hot key drives it toward N^2). One-
    sided like every count-min estimate, exact at low load."""
    uniform = spark.createDataFrame([(i % 10,) for i in range(100)], "k long")
    skewed = spark.createDataFrame(
        [(0,)] * 91 + [(i,) for i in range(1, 10)], "k long"
    )
    f2 = {}
    for name, df in (("uniform", uniform), ("skewed", skewed)):
        s = sketches.countmin_build(df, "k", depth=5, width=4096)
        f2[name] = sketches.countmin_join_size(s, s).first()["est_join_rows"]
    assert f2["uniform"] == 10 * 10 * 10      # 10 keys x 10^2
    assert f2["skewed"] == 91 * 91 + 9        # hot key dominates
    assert f2["skewed"] > 8 * f2["uniform"]   # the skew signal fires


# --- KLL-shaped mergeable rank sketch --------------------------------------


def _kll_true_rank_err(sketch_df, data, qs):
    """Max |true_rank(estimate) - q*n| over the probe quantiles, via
    numpy searchsorted on the exact sorted data."""
    import numpy as np

    est = {
        r.q: r.estimate
        for r in sketches.kll_quantile(sketch_df, qs).collect()
    }
    srt = np.sort(data)
    n = len(srt)
    worst = 0.0
    for q in qs:
        v = est[q]
        lo = np.searchsorted(srt, v, side="left")
        hi = np.searchsorted(srt, v, side="right")
        target = q * n
        # any position within the tie block is a valid rank for v
        err = 0.0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target)
        )
        worst = max(worst, err)
    return worst


def _kll_bound(sketch_df, n, k):
    """The documented deterministic worst case: 2*H*n/k with H = number
    of levels actually present in the sketch."""
    h = sketches and max(
        r.level for r in sketch_df.select("level").distinct().collect()
    ) + 1
    return 2.0 * h * n / k


@pytest.mark.slow
def test_kll_weight_conservation_and_bounded_size(spark):
    """Sum of 2^level over the sketch is EXACTLY n (odd stragglers keep
    their level; compaction pairs evenly), and the sketch row count is
    bounded by k * levels regardless of input size."""
    import numpy as np

    rng = np.random.RandomState(7)
    for n in (1, 2, 257, 4097, 60_001):
        df = spark.createDataFrame(
            [(float(v),) for v in rng.lognormal(0, 2, n)], "x double"
        ).repartition(8)
        sk = sketches.kll_build(df, "x", k=128).cache()
        w = sk.select(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), level)"))
        ).first()[0]
        assert w == n, (n, w)
        h = sk.agg(F.max("level")).first()[0] + 1
        assert sk.count() <= 128 * h + 128  # k per level (+ slack for top)


@pytest.mark.slow
def test_kll_rank_error_within_deterministic_bound(spark):
    """The 2*H*n/k worst case holds on adversarial and benign inputs:
    pre-sorted, reverse-sorted, heavy ties, lognormal — the shapes that
    break naive sampling. Typical error on the benign shapes sits an
    order of magnitude under the bound (pinned loosely so the toggle's
    cancellation is actually exercised, not just the worst case)."""
    import numpy as np

    rng = np.random.RandomState(11)
    n, k = 60_000, 256
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    shapes = {
        "sorted": np.arange(n, dtype="float64"),
        "reverse": np.arange(n, dtype="float64")[::-1],
        "ties": np.repeat(np.arange(60, dtype="float64"), n // 60),
        "lognormal": rng.lognormal(0, 3, n),
    }
    for name, data in shapes.items():
        df = spark.createDataFrame(
            [(float(v),) for v in data], "x double"
        ).repartition(8)
        sk = sketches.kll_build(df, "x", k=k).cache()
        err = _kll_true_rank_err(sk, data, qs)
        bound = _kll_bound(sk, n, k)
        assert err <= bound, (name, err, bound)
    # benign distribution: observed error well under the worst case
    assert _kll_true_rank_err(sk, shapes["lognormal"], qs) <= n * 8 / k


@pytest.mark.slow
def test_kll_exact_when_uncompacted_and_null_handling(spark):
    """n <= k in one partition: nothing ever compacts, every row stays
    at level 0, and the quantile IS the exact order statistic (rank
    ceil(q*n)). NULLs drop out of the sketch entirely."""
    vals = [5.0, None, 1.0, 9.0, None, 3.0, 7.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double").coalesce(1)
    sk = sketches.kll_build(df, "x", k=64).cache()
    assert {r.level for r in sk.collect()} == {0}
    assert sk.count() == 5  # NULLs dropped
    got = {
        r.q: r.estimate
        for r in sketches.kll_quantile(sk, [0.2, 0.4, 0.6, 0.8, 1.0]).collect()
    }
    assert got == {0.2: 1.0, 0.4: 3.0, 0.6: 5.0, 0.8: 7.0, 1.0: 9.0}


def test_kll_merge_guarantee_and_stream_partials(spark, tmp_path):
    """The mergeable-summary contract: per-batch partials persisted
    under batch_id=N, merged on read LONG after the data is gone, still
    inside the deterministic rank bound over the union — and exact
    weight conservation proves no rows were lost or double-counted.
    Mixed-k merges are rejected loudly."""
    import numpy as np

    import pytest as _pytest

    rng = np.random.RandomState(3)
    batches = [rng.normal(100, 15, 9_000), rng.normal(130, 5, 7_000),
               rng.lognormal(2, 1, 4_000)]
    out = str(tmp_path / "kll_partials")
    for i, data in enumerate(batches):
        df = spark.createDataFrame(
            [(float(v),) for v in data], "x double"
        ).repartition(4)
        (
            sketches.kll_partials(df, "x", k=256)
            .withColumn("batch_id", F.lit(i))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )
    merged = sketches.kll_merge(
        spark.read.parquet(out).drop("batch_id")
    ).cache()
    union = np.concatenate(batches)
    n = len(union)
    w = merged.select(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), level)"))
    ).first()[0]
    assert w == n
    err = _kll_true_rank_err(merged, union, [0.1, 0.5, 0.9])
    assert err <= _kll_bound(merged, n, 256)
    other = sketches.kll_build(
        spark.createDataFrame([(1.0,)], "x double"), "x", k=128
    )
    with _pytest.raises(ValueError, match="different k"):
        sketches.kll_merge(merged, other).collect()


@pytest.mark.slow
def test_kll_determinism_and_rank_inverse(spark):
    """Same input, same partitioning => bit-equal sketch rows (the
    deterministic toggle, not a coin flip). kll_rank is the monotone
    inverse of kll_quantile: frac at the q-quantile estimate ~ q, and
    probes below/above the domain clamp to 0/1."""
    import numpy as np

    import pytest as _pytest

    rng = np.random.RandomState(5)
    data = rng.gamma(2.0, 10.0, 30_000)
    df = spark.createDataFrame(
        [(float(v),) for v in data], "x double"
    ).repartition(8, "x")
    s1 = sorted(
        (r.level, r.x) for r in sketches.kll_build(df, "x", k=256).collect()
    )
    s2 = sorted(
        (r.level, r.x) for r in sketches.kll_build(df, "x", k=256).collect()
    )
    assert s1 == s2
    sk = sketches.kll_build(df, "x", k=256).cache()
    med = sketches.kll_quantile(sk, [0.5]).first().estimate
    ranks = {
        r.x: r.frac
        for r in sketches.kll_rank(
            sk, [float(data.min()) - 1.0, med, float(data.max()) + 1.0]
        ).collect()
    }
    assert ranks[float(data.min()) - 1.0] == 0.0
    assert ranks[float(data.max()) + 1.0] == 1.0
    assert abs(ranks[med] - 0.5) <= 2 * 10 * 256 / 30_000  # ~2H/k slack
    with _pytest.raises(ValueError, match="q must be in"):
        sketches.kll_quantile(sk, [1.5]).collect()
    with _pytest.raises(ValueError, match="empty sketch"):
        sketches.kll_quantile(
            sketches.kll_build(
                spark.createDataFrame([], "x double"), "x"
            ),
            [0.5],
        ).collect()
    with _pytest.raises(ValueError, match="k >= 2"):
        sketches.kll_partials(df, "x", k=1)


def test_kll_face_within_rank_tolerance(spark, sf_dir):
    """The staged rows-only face: every KLL decile estimate of
    o_totalprice must sit within the deterministic rank bound of the
    true rank (checked against DuckDB's exact CDF on the same parquet)
    — the tolerance gate a hash check can't provide for an approximate
    operator."""
    import duckdb

    from realtime_data_pipeline_spark.queries import analytics

    got = {
        r.q: r.estimate
        for r in analytics.orders_price_quantiles_kll(
            spark, sf_dir
        ).collect()
    }
    assert sorted(got) == [
        0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9
    ]
    # estimates must be monotone in q
    ests = [got[q] for q in sorted(got)]
    assert ests == sorted(ests)
    con = duckdb.connect()
    n, = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    # H from the sketch geometry at this n, k=256 (face default)
    import math

    h = max(1, math.ceil(math.log2(max(n / 256, 2))) + 1)
    bound = 2.0 * h * n / 256
    for q, v in got.items():
        lo, hi = con.execute(
            f"""SELECT COUNT(*) FILTER (WHERE o_totalprice < {v}),
                       COUNT(*) FILTER (WHERE o_totalprice <= {v})
                FROM read_parquet('{sf_dir}/orders.parquet')"""
        ).fetchone()
        target = q * n
        err = 0.0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target)
        )
        assert err <= bound, (q, v, err, bound)
