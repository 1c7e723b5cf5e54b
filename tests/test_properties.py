"""Property-based checks (hypothesis) for the operators whose edge cases
are easy to miss with example tests: the DQ split partition invariant,
the as-of join against pandas merge_asof as an independent reference, and
the MinHash estimator's error bound. Example counts are kept small —
each example runs a Spark job."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import dq, neardup, ops

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

maybe_float = st.one_of(
    st.none(), st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)
)


@given(rows=st.lists(st.tuples(maybe_float, maybe_float), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_dq_split_always_partitions_input(spark, rows):
    """clean + violations == input for ANY null pattern, and the split
    agrees with the single-pass violation counts."""
    df = spark.createDataFrame(rows, "a double, b double")
    rules = [
        dq.Rule("a_neg", F.col("a") < 0),
        dq.Rule("b_big", F.col("b") > 100),
    ]
    clean, bad = dq.split_clean_violations(df, rules)
    assert clean.count() + bad.count() == len(rows)
    counts = dq.violation_counts_df(df, rules).collect()[0]
    # a row is bad iff SOME rule predicate is definitively True
    expected_bad = sum(
        1
        for a, b in rows
        if (a is not None and a < 0) or (b is not None and b > 100)
    )
    assert bad.count() == expected_bad
    assert counts["total_rows"] == len(rows)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, direction, left, right):
    """ops.asof_join (union + carry window) ≡ pandas merge_asof in all three
    directions for deduped right sides — the independent reference
    implementation (nearest ties go backward in both)."""
    right = list({(k, t): None for k, t in right}.keys())  # dedup (key, ts)
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in right], "k long, ts long, v double"
    )
    got = (
        ops.asof_join(ldf, rdf, "k", "ts", "ts", ["v"], direction=direction)
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "ts", "lid"]
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in right], columns=["k", "ts", "v"]
    ).sort_values("ts", kind="stable")
    want = (
        pd.merge_asof(lpd, rpd, on="ts", by="k", direction=direction)
        .sort_values("lid")
        .reset_index(drop=True)
    )
    got_v = [None if pd.isna(x) else x for x in got["v_asof"]]
    want_v = [None if pd.isna(x) else x for x in want["v"]]
    assert got_v == want_v


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
         "iota", "kappa"]


@given(
    base=st.lists(st.sampled_from(WORDS), min_size=10, max_size=40),
    edits=st.integers(0, 5),
    seed=st.integers(0, 2**20),
)
@settings(**SETTINGS)
def test_minhash_estimate_tracks_exact_jaccard(spark, base, edits, seed):
    """|MinHash estimate − exact Jaccard| stays within 4σ of the k=64
    estimator (σ = sqrt(j(1−j)/k) ≤ 0.0625) plus banding-free slack."""
    import random

    rng = random.Random(seed)
    other = list(base)
    for _ in range(edits):
        other[rng.randrange(len(other))] = rng.choice(WORDS)
    df = spark.createDataFrame(
        [(" ".join(base), " ".join(other))], "ta string, tb string"
    )
    sh_a = F.array_distinct(neardup.word_shingles(F.col("ta"), 2))
    sh_b = F.array_distinct(neardup.word_shingles(F.col("tb"), 2))
    mh = neardup.minhash_signature_udf(k=64, seed=42)
    row = df.select(
        neardup.exact_jaccard(sh_a, sh_b).alias("exact"),
        neardup.minhash_est_jaccard(
            mh(neardup.shingle_hashes(sh_a)),
            mh(neardup.shingle_hashes(sh_b)),
            64,
        ).alias("est"),
    ).collect()[0]
    assert 0.0 <= row.exact <= 1.0
    assert abs(row.est - row.exact) <= 0.3
