"""Property-based checks (hypothesis) for the operators whose edge cases
are easy to miss with example tests: the DQ split partition invariant,
the as-of join against pandas merge_asof as an independent reference, and
the MinHash estimator's error bound. Example counts are kept small —
each example runs a Spark job."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, given, settings
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


@pytest.mark.slow
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
@pytest.mark.slow
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
@pytest.mark.slow
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


@given(
    base=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 2), st.integers(1, 3)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    upd=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 2), st.integers(1, 3)),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_merge_upsert_matches_pandas_model(spark, tmp_path_factory, base, upd):
    """merge_upsert == groupwise 'highest version wins, update beats
    target on ties' over ANY base/update overlap pattern, any partition
    spread — checked against an independent pandas model implementing the
    documented contract: merge identity is (keys, partition), so a key
    appearing in two partitions is two identities (cross-partition moves
    are delete+insert territory — partition-scoped pruning can't see the
    source partition, a hole hypothesis found in the first cut)."""
    from realtime_data_pipeline_spark import medallion

    tgt = str(tmp_path_factory.mktemp("merge") / "t")
    base_df = spark.createDataFrame(base, "id long, d long, ver long")
    medallion.merge_upsert(
        spark, tgt, base_df, keys=["id"], order_by=["ver"], partition_col="d"
    )
    upd_df = spark.createDataFrame(upd, "id long, d long, ver long")
    medallion.merge_upsert(
        spark, tgt, upd_df, keys=["id"], order_by=["ver"], partition_col="d"
    )

    # pandas model: concat with source flag, sort so the winner is first;
    # identity = (id, d) per the partition-scoped contract
    pb = pd.DataFrame(base, columns=["id", "d", "ver"]).assign(src=0)
    pu = pd.DataFrame(upd, columns=["id", "d", "ver"]).assign(src=1)
    both = pd.concat([pb, pu]).sort_values(
        ["id", "d", "ver", "src"], ascending=[True, True, False, False]
    )
    expected = both.groupby(["id", "d"]).head(1)[["id", "d", "ver"]]

    got = {
        (r.id, r.d, r.ver) for r in spark.read.parquet(tgt).collect()
    }
    assert got == set(map(tuple, expected.itertuples(index=False)))


printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@given(rows=st.lists(printable, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_tokenization_parity_spark_vs_duckdb(spark, rows):
    """The curation oracles assume Spark split(trim, \\s+) and DuckDB
    string_split_regex(trim, '\\s+') tokenize IDENTICALLY for any
    printable-ASCII text — fixture regeneration with richer text must not
    silently break that equivalence (hash mismatches would then be
    tokenizer drift, not operator bugs)."""
    import duckdb

    from realtime_data_pipeline_spark import text

    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(rows)], "id long, t string"
    )
    got = {
        r.id: list(r.w)
        for r in sdf.select("id", text.words(F.col("t")).alias("w")).collect()
    }
    for i, s in enumerate(rows):
        want = duckdb.sql(
            r"SELECT string_split_regex(trim(?), '\s+')", params=[s]
        ).fetchone()[0]
        assert got[i] == want, f"tokenizer drift on {s!r}"


pii_ish = st.text(
    alphabet=list("abcXYZ0123456789@.-+ _%"), max_size=60
)


@given(rows=st.lists(pii_ish, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_pii_redaction_parity_spark_vs_duckdb(spark, rows):
    """Java regex and RE2 must agree on every PII pattern for arbitrary
    ASCII soup (emails-ish, digit runs, separators) — the redaction
    oracle compares redacted TEXT, so any engine disagreement is a
    correctness failure waiting for a richer fixture."""
    import duckdb

    from realtime_data_pipeline_spark import text

    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(rows)], "id long, t string"
    )
    got = {
        r.id: r.red
        for r in sdf.select(
            "id", text.redact_pii(F.col("t")).alias("red")
        ).collect()
    }
    for i, s in enumerate(rows):
        want = s
        for _, pattern, repl in text.PII_RULES:
            want = duckdb.sql(
                "SELECT regexp_replace(?, ?, ?, 'g')",
                params=[want, pattern, repl],
            ).fetchone()[0]
        assert got[i] == want, f"regex engine drift on {s!r}"


@given(
    weights=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    bucket_size=st.sampled_from([1, 3, 10, 1000]),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_prefix_sum_property_matches_python_model(spark, weights, bucket_size):
    """Distributed exclusive prefix sum == the trivial Python running sum
    for arbitrary weights (incl. zeros) and any bucket geometry, over
    gappy non-contiguous ids."""
    from realtime_data_pipeline_spark import packing

    ids = [i * 7 + 3 for i in range(len(weights))]  # gappy, increasing
    df = spark.createDataFrame(list(zip(ids, weights)), "id long, w long")
    got = {
        r.id: r.offset
        for r in packing.exclusive_prefix_sum(
            df, "id", "w", bucket_size=bucket_size
        ).collect()
    }
    acc, want = 0, {}
    for i, w in zip(ids, weights):
        want[i] = acc
        acc += w
    assert got == want


@given(
    n_words=st.integers(min_value=1, max_value=120),
    chunk=st.integers(min_value=2, max_value=40),
    overlap=st.integers(min_value=0, max_value=39),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_chunk_text_reconstructs_document(spark, n_words, chunk, overlap):
    """Lossless-coverage property: concatenating chunk 0 with every later
    chunk minus its first `overlap` words reproduces the document's token
    stream exactly, for any (chunk, overlap) geometry — each chunk's
    fresh suffix starts precisely where the previous chunk ended."""
    from hypothesis import assume

    from realtime_data_pipeline_spark import packing

    assume(overlap < chunk)
    text = " ".join(f"t{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        packing.chunk_text(
            df, "doc_id", "text", chunk_words=chunk, overlap_words=overlap
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    rebuilt: list[str] = []
    for r in rows:
        toks = r.chunk_text.split()
        assert len(toks) == r.n_chunk_words
        rebuilt.extend(toks if r.chunk_idx == 0 else toks[overlap:])
    assert rebuilt == [f"t{i}" for i in range(n_words)]


@given(
    obs=st.dictionaries(
        st.tuples(st.integers(0, 3), st.integers(1, 12)),  # (key, day)
        st.integers(0, 2),  # tracked value
        min_size=1,
        max_size=14,
    ),
    cuts=st.lists(st.integers(0, 13), min_size=0, max_size=2),
    replay_last=st.booleans(),
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_scd2_merge_is_batch_split_invariant(
    spark, tmp_path_factory, obs, cuts, replay_last
):
    """For a TIME-MONOTONE observation stream (each batch's observations
    are no earlier than the previous batches' — the shape of any
    event-time-ordered feed), scd2_merge is invariant to where the
    stream is cut into batches, including replaying a batch verbatim:
    every split converges to the one-shot chain over the union — checked
    against an independent Python model (sort per key, collapse
    consecutive repeats, chain the intervals). OUT-OF-ORDER arrivals are
    deliberately excluded here: a late observation that precedes a
    COLLAPSED repeat cannot restore the collapsed boundary (the evidence
    was merged away), so cross-batch invariance cannot hold for them —
    that re-attribution edge is pinned deterministically by
    tests/test_scd2.py::test_late_splice_before_collapsed_repeat and the
    same-timestamp variant by
    tests/test_scd2.py::test_correction_after_collapse_reattributes_history.
    """
    import datetime as dt

    from realtime_data_pipeline_spark import medallion

    tgt = str(tmp_path_factory.mktemp("scd2") / "dim")
    day = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    # time-sorted stream: any cut yields per-key monotone batches
    stream = [
        (f"k{k}", f"v{v}", day(d))
        for (k, d), v in sorted(obs.items(), key=lambda kv: (kv[0][1], kv[0][0]))
    ]
    # arbitrary split into up to 3 batches (empty slices dropped)
    bounds = sorted({min(c, len(stream)) for c in cuts})
    batches = [
        b
        for b in (
            stream[i:j]
            for i, j in zip([0, *bounds], [*bounds, len(stream)])
        )
        if b
    ]
    if replay_last:
        batches.append(batches[-1])
    for batch in batches:
        medallion.scd2_merge(
            spark,
            tgt,
            spark.createDataFrame(
                batch, "id string, val string, eff timestamp"
            ),
            keys=["id"],
            effective_col="eff",
            n_buckets=4,
        )

    per_key: dict[str, list] = {}
    for (k, d), v in sorted(obs.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        chain = per_key.setdefault(f"k{k}", [])
        if not chain or chain[-1][1] != f"v{v}":
            chain.append((d, f"v{v}"))
    expected = {
        key: [
            (
                val,
                day(d),
                day(chain[i + 1][0]) if i + 1 < len(chain) else None,
                i + 1 == len(chain),
            )
            for i, (d, val) in enumerate(chain)
        ]
        for key, chain in per_key.items()
    }

    got: dict[str, list] = {}
    for r in (
        medallion.scd2_read(spark, tgt).orderBy("id", "__valid_from").collect()
    ):
        got.setdefault(r["id"], []).append(
            (r["val"], r["__valid_from"], r["__valid_to"], r["__is_current"])
        )
    assert got == expected


@given(
    values=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40
    ),
    preds=st.lists(
        st.tuples(
            st.sampled_from(["x"]),
            st.sampled_from(["=", "<", "<=", ">", ">="]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=200, deadline=None)
def test_stats_pruning_is_sound(values, preds):
    """Data-skipping soundness (no Spark needed): a file whose rows
    contain ANY value satisfying every predicate must be KEPT by
    _file_may_match given that file's true [min, max] — pruning may
    only ever drop provably-dead files. (Completeness — dropping as
    much as possible — is an optimization; soundness is correctness.)"""
    from realtime_data_pipeline_spark import versioned

    stats = {"x": [min(values), max(values)]}

    def row_matches(v: int) -> bool:
        for _, op, lit in preds:
            ok = {
                "=": v == lit,
                "<": v < lit,
                "<=": v <= lit,
                ">": v > lit,
                ">=": v >= lit,
            }[op]
            if not ok:
                return False
        return True

    if any(row_matches(v) for v in values):
        assert versioned._file_may_match(stats, preds) is True


@given(
    values=st.lists(
        st.one_of(
            st.floats(
                allow_nan=False,
                allow_infinity=False,
                min_value=-100.0,
                max_value=100.0,
            ),
            st.just(float("nan")),
        ),
        min_size=1,
        max_size=20,
    ),
    preds=st.lists(
        st.tuples(
            st.sampled_from(["x"]),
            st.sampled_from(["=", "<", "<=", ">", ">="]),
            st.floats(
                allow_nan=False,
                allow_infinity=False,
                min_value=-100.0,
                max_value=100.0,
            ),
        ),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=200, deadline=None)
def test_stats_pruning_is_sound_for_nan_floats(values, preds):
    """The float trap: parquet footer min/max EXCLUDE NaN, Spark SQL
    orders NaN ABOVE every value — so a file whose only rows matching
    ``col > v`` are NaN must still be kept even though its recorded max
    disproves the range. row_matches below uses Spark's comparison
    semantics; stats are what _collect_file_stats would record."""
    from realtime_data_pipeline_spark import versioned

    finite = [v for v in values if v == v]
    if not finite:
        return  # footer records no min/max -> absent stats never prune
    stats = {"x": [min(finite), max(finite), "f"]}

    def row_matches(v: float) -> bool:
        for _, op, lit in preds:
            if v != v:  # NaN: Spark orders it larger than everything
                ok = op in (">", ">=")
            else:
                ok = {
                    "=": v == lit,
                    "<": v < lit,
                    "<=": v <= lit,
                    ">": v > lit,
                    ">=": v >= lit,
                }[op]
            if not ok:
                return False
        return True

    if any(row_matches(v) for v in values):
        assert versioned._file_may_match(stats, preds) is True


@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_png_decode_inverts_any_per_row_filter_choice(h, w, ch, seed):
    """Real encoders pick a DIFFERENT filter per row; the decoder must
    invert any mix of the five filter types (the uniform-filter unit
    test can't catch cross-row filter interactions like Paeth reading
    an Up-filtered previous row)."""
    import struct
    import zlib

    import numpy as np

    from realtime_data_pipeline_spark import multimodal

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    filters = rng.randint(0, 5, size=h)

    stride = w * ch
    flat = px.reshape(h, stride).astype(int)
    raw = b""
    prev = np.zeros(stride, dtype=int)
    for y in range(h):
        cur = flat[y]
        f = int(filters[y])
        line = np.zeros(stride, dtype=int)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) >> 1,
            }.get(f)
            if pred is None:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) % 256
        raw += bytes([f]) + bytes(line.astype(np.uint8))
        prev = cur

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        )
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (multimodal.decode_png(data) == px).all()


@given(
    pts=st.lists(
        st.one_of(st.none(), st.integers(0, 5000)), min_size=1, max_size=25
    ),
    ivs=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5000)),
            st.integers(-200, 3000),
        ),
        min_size=1,
        max_size=15,
    ),
    band=st.integers(25, 2000),
)
@pytest.mark.slow
@settings(**{**SETTINGS, "max_examples": 5})
def test_banded_joins_match_nonequi_for_any_band_width(
    spark, pts, ivs, band
):
    """For ANY band width, banded_interval_join and banded_overlap_join
    equal their naive non-equi spellings exactly — band geometry must be
    invisible in results (NULLs, inverted intervals, boundary epochs
    included). Intervals are (start, start+len) with len possibly
    negative (inverted); everything in epoch seconds via timestamps."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return None if sec is None else base + dt.timedelta(seconds=sec)

    points = spark.createDataFrame(
        [(i, ts(p)) for i, p in enumerate(pts)], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (j, ts(s), None if s is None else ts(s + ln))
            for j, (s, ln) in enumerate(ivs)
        ],
        "iid long, s timestamp, e timestamp",
    )
    got = {
        (r.pid, r.iid)
        for r in ops.banded_interval_join(
            points, intervals, "ts", "s", "e", band_seconds=band
        )
        .select("pid", "iid")
        .collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")),
        )
        .select("pid", "iid")
        .collect()
    }
    assert got == naive

    lft = intervals.select(
        F.col("iid").alias("lid"),
        F.col("s").alias("ls"),
        F.col("e").alias("le"),
    )
    rgt = intervals.select(
        F.col("iid").alias("rid"),
        F.col("s").alias("rs"),
        F.col("e").alias("re"),
    )
    ov = [
        (r.lid, r.rid)
        for r in ops.banded_overlap_join(
            lft, rgt, "ls", "le", "rs", "re", band_seconds=band
        )
        .select("lid", "rid")
        .collect()
    ]
    # reference restricted to VALID intervals: the raw overlap predicate
    # matches an INVERTED (empty) interval nested inside its partner —
    # an artifact the operator deliberately rejects (documented
    # contract: empty intervals overlap nothing). Hypothesis found this
    # divergence; the operator's semantic is the intended one.
    ov_naive = {
        (r.lid, r.rid)
        for r in lft.filter(F.col("ls") <= F.col("le"))
        .join(
            rgt.filter(F.col("rs") <= F.col("re")),
            (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
        )
        .select("lid", "rid")
        .collect()
    }
    assert set(ov) == ov_naive
    assert len(ov) == len(ov_naive)  # anchor rule: exactly once per pair


@given(
    history=st.lists(
        st.tuples(
            st.sampled_from(["append", "overwrite"]),
            st.lists(
                st.tuples(st.integers(0, 6), st.sampled_from("abc")),
                min_size=0,
                max_size=5,
            ),
        ),
        min_size=2,
        max_size=5,
    ),
    data=st.data(),
)
@pytest.mark.slow
@settings(**{**SETTINGS, "max_examples": 6})
def test_diff_versions_equals_snapshot_multiset_difference(
    spark, tmp_path_factory, history, data
):
    """For ANY commit history (appends and overwrites, duplicate rows
    included) and ANY version span, diff_versions equals the brute-force
    MULTISET difference of the two snapshots — the manifest-level shared
    -file cancellation must be invisible in the result; and applying the
    diff to the from-snapshot reproduces the to-snapshot exactly."""
    from collections import Counter

    from realtime_data_pipeline_spark import versioned

    root = str(tmp_path_factory.mktemp("dv") / "zone")
    # the first commit establishes the zone (mode of v0 is irrelevant)
    for mode, rows in history:
        df = spark.createDataFrame(
            rows, "k long, v string"
        ) if rows else spark.createDataFrame([], "k long, v string")
        versioned.commit_version(df.coalesce(1), root, mode=mode)

    known = versioned.versions(root)
    v_from = data.draw(st.sampled_from(known), label="v_from")
    v_to = data.draw(st.sampled_from(known), label="v_to")

    def snapshot(v):
        return Counter(
            (r.k, r.v)
            for r in versioned.read_version(spark, root, v).collect()
        )

    s_from, s_to = snapshot(v_from), snapshot(v_to)
    diff = versioned.diff_versions(spark, root, v_from, v_to).collect()
    ins = Counter(
        (r.k, r.v) for r in diff if r._change_type == "insert"
    )
    dels = Counter(
        (r.k, r.v) for r in diff if r._change_type == "delete"
    )
    assert ins == s_to - s_from
    assert dels == s_from - s_to
    # applying the diff moves from -> to exactly
    assert s_from + ins - dels == s_to


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            # no subnormals: LAPACK's scaling step rejects them (the
            # np.polyfit ORACLE crashes, not the operator — r13 verdict)
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_subnormal=False,
            ),
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_subnormal=False,
            ),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_grouped_ols_matches_numpy_on_random_groups(spark, rows):
    """For ANY grouped scatter, grouped_ols agrees with numpy polyfit
    where x varies and returns NULLs where it cannot (zero x-variance),
    never raising. The NULL branch is decided by the ENGINE's own
    float64 criterion (vx = n·Σxx − (Σx)² > 0), not np.ptp — a span can
    be nonzero while vx underflows to 0.0, and the engine's documented
    contract keys on vx (r13 verdict)."""
    import numpy as np

    from realtime_data_pipeline_spark import reduction

    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in reduction.grouped_ols(df, ["g"], "x", "y").collect()}
    groups: dict = {}
    for g, x, y in rows:
        groups.setdefault(g, []).append((x, y))
    assert set(got) == set(groups)
    for g, pts in groups.items():
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        r = got[g]
        assert r.n == len(pts)
        n = np.float64(len(pts))
        vx = float(n * np.sum(xs * xs) - np.sum(xs) ** 2)
        # borderline vx (positive but negligible vs the sums' magnitude)
        # is summation-order territory where Spark's partial-agg order
        # and numpy's may legitimately disagree — not a property to pin
        assume(vx <= 0 or vx > 1e-9 * max(1.0, float(n * np.sum(xs * xs))))
        if vx > 0:
            try:
                slope_ref, b0_ref = np.polyfit(xs, ys, 1)
            except np.linalg.LinAlgError:
                # residual LAPACK fragility is an oracle limit
                assume(False)
            assert abs(r.slope - slope_ref) < 1e-6 * max(1, abs(slope_ref))
            assert abs(r.intercept - b0_ref) < 1e-6 * max(1, abs(b0_ref))
        else:
            assert r.slope is None and r.r2 is None


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-6, max_value=6, allow_nan=False),
            min_size=3, max_size=3,
        ),
        min_size=4,
        max_size=24,
    )
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_drift_psi_identity_and_symmetry(spark, vecs):
    """PSI(a, a) == 0 exactly for any corpus, and PSI is symmetric
    (|PSI(a,b)| == |PSI(b,a)| term-for-term since each term flips
    sign twice)."""
    from realtime_data_pipeline_spark import reduction

    df = spark.createDataFrame([(v,) for v in vecs], "embedding array<double>")
    same = reduction.drift_psi(df, df, n_bins=4).collect()
    assert all(abs(r.psi) < 1e-12 for r in same)
    half_a = spark.createDataFrame(
        [(v,) for v in vecs[: len(vecs) // 2]], "embedding array<double>"
    )
    half_b = spark.createDataFrame(
        [(v,) for v in vecs[len(vecs) // 2 :]], "embedding array<double>"
    )
    ab = {r.dim: r.psi for r in reduction.drift_psi(half_a, half_b, n_bins=4).collect()}
    ba = {r.dim: r.psi for r in reduction.drift_psi(half_b, half_a, n_bins=4).collect()}
    for d in ab:
        assert abs(ab[d] - ba[d]) < 1e-9


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from([0, 1, 2]),
            st.lists(
                st.floats(
                    min_value=-6, max_value=6,
                    allow_nan=False, allow_subnormal=False,
                ),
                min_size=2, max_size=2,
            ),
        ),
        min_size=2,
        max_size=30,
    )
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_label_mi_nonnegative_and_zero_on_single_label(spark, rows):
    """Mutual information is nonnegative for ANY corpus (up to float
    summation dust), and exactly zero when only one label exists (the
    joint equals the product of marginals cell-for-cell)."""
    from realtime_data_pipeline_spark import reduction

    df = spark.createDataFrame(
        rows, "label int, embedding array<double>"
    )
    for r in reduction.label_mi(df).collect():
        assert r.mi > -1e-9
    one = df.withColumn("label", df.label * 0)
    for r in reduction.label_mi(one).collect():
        assert abs(r.mi) < 1e-12


@given(
    xs=st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False,
                  allow_subnormal=False),
        min_size=2, max_size=25,
    ),
    scale=st.floats(min_value=1e-3, max_value=1e3, allow_nan=False,
                    allow_subnormal=False),
)
@settings(**SETTINGS)
def test_gini_is_scale_invariant_and_bounded(spark, xs, scale):
    """Round-15 invariants of the rank-formula Gini: multiplying every
    value by a positive constant cannot change G (it is a pure
    concentration measure), and G always lies in [0, (n−1)/n]. Groups
    whose total is 0 read NULL."""
    from realtime_data_pipeline_spark import reduction

    assume(sum(xs) > 0)
    rows = [("a", f"k{i}", float(v)) for i, v in enumerate(xs)]
    rows += [("b", f"k{i}", float(v * scale)) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, k string, x double")
    out = {
        r.g: r.gini
        for r in reduction.grouped_gini(df, ["g"], "x", "k").collect()
    }
    n = len(xs)
    assert out["a"] is not None
    assert abs(out["a"] - out["b"]) < 1e-9
    assert -1e-12 <= out["a"] <= (n - 1) / n + 1e-12


@given(
    cats=st.lists(st.integers(min_value=0, max_value=5),
                  min_size=1, max_size=30),
    perm_seed=st.integers(min_value=0, max_value=10_000),
)
@settings(**SETTINGS)
def test_entropy_is_label_renaming_invariant_and_bounded(
    spark, cats, perm_seed
):
    """Round-15 invariants of grouped_entropy: renaming categories (any
    permutation of the label alphabet) cannot change H, and
    0 ≤ H ≤ log2(n_cats) (so evenness ∈ [0, 1] where defined)."""
    import math
    import random

    from realtime_data_pipeline_spark import reduction

    perm = list(range(6))
    random.Random(perm_seed).shuffle(perm)
    rows = [("a", f"c{c}") for c in cats]
    rows += [("b", f"c{perm[c]}") for c in cats]
    df = spark.createDataFrame(rows, "g string, cat string")
    out = {
        r.g: r
        for r in reduction.grouped_entropy(df, ["g"], "cat").collect()
    }
    a, b = out["a"], out["b"]
    assert a.n_cats == b.n_cats
    assert abs(a.entropy_bits - b.entropy_bits) < 1e-9
    assert -1e-12 <= a.entropy_bits <= math.log2(max(a.n_cats, 1)) + 1e-9
    if a.n_cats > 1:
        assert -1e-12 <= a.evenness <= 1 + 1e-12
    else:
        assert a.evenness is None


@given(
    a=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False,
                         allow_subnormal=False),
               min_size=1, max_size=20),
    b=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False,
                         allow_subnormal=False),
               min_size=1, max_size=20),
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_drift_ks_symmetric_and_bounded(spark, a, b):
    """Round-15 invariants of the two-sample KS: D is symmetric in the
    two corpora, lies in [0, 1], and is 0 iff the empirical
    distributions coincide (checked via the multiset equality case)."""
    from realtime_data_pipeline_spark import reduction

    mk = lambda vs: spark.createDataFrame(
        [(list([float(v)]),) for v in vs], "embedding array<double>"
    )
    d1 = reduction.drift_ks(mk(a), mk(b)).first()
    d2 = reduction.drift_ks(mk(b), mk(a)).first()
    assert d1.ks == d2.ks
    assert 0.0 <= d1.ks <= 1.0
    same = reduction.drift_ks(mk(a), mk(a)).first()
    assert same.ks == 0.0
