"""Sequence-packing operator (packing.py): distributed exclusive prefix
sum + concat-then-chunk block assignment."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import packing


def _naive_exclusive(df, order_col, weight_col):
    """The single-partition spelling the distributed version must equal."""
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "offset", F.coalesce(F.sum(weight_col).over(w), F.lit(0)).cast("long")
    )


def test_prefix_sum_matches_naive_window_across_bucket_sizes(spark):
    """Exclusive prefix sum equals the global-window spelling for every
    bucket size (1 row/bucket through one-bucket-holds-all) — bucket
    geometry is an execution detail, never a result."""
    rows = [(i * 3 + 1, (i * 7) % 5 + 1) for i in range(200)]  # gappy ids
    df = spark.createDataFrame(rows, "id long, w long")
    expected = {
        (r.id, r.offset)
        for r in _naive_exclusive(df, "id", "w").collect()
    }
    for bucket_size in (1, 7, 64, 10_000):
        got = {
            (r.id, r.offset)
            for r in packing.exclusive_prefix_sum(
                df, "id", "w", bucket_size=bucket_size
            ).collect()
        }
        assert got == expected, f"bucket_size={bucket_size}"


def test_pack_concat_chunks_block_math(spark):
    """Block spans: docs fill blocks contiguously, straddlers span
    multiple blocks, zero-token docs are dropped."""
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 100), (4, 30)], "doc_id long, n_tokens long"
    )
    out = {
        r.doc_id: r
        for r in packing.pack_concat_chunks(
            df, "doc_id", "n_tokens", ctx_len=64
        ).collect()
    }
    assert set(out) == {1, 3, 4}  # zero-token doc 2 dropped
    assert (out[1].offset, out[1].start_block, out[1].end_block) == (0, 0, 0)
    # doc 3: tokens 10..109 -> blocks 0 and 1
    assert (out[3].offset, out[3].start_block, out[3].end_block) == (10, 0, 1)
    assert out[3].blocks_spanned == 2
    assert out[3].start_offset == 10
    # doc 4: tokens 110..139 -> block 1 and 2 (128 boundary)
    assert (out[4].offset, out[4].start_block, out[4].end_block) == (110, 1, 2)


def test_block_manifest_tiles_blocks_and_docs_exactly(spark):
    """Manifest invariants: every block except the last is covered by
    slices summing to exactly ctx_len with no overlap (offsets + lengths
    tile [0, ctx_len)), and each doc's slices reconstruct the whole doc
    in order."""
    df = spark.createDataFrame(
        [(1, 10), (2, 100), (3, 30), (4, 64), (5, 7)],
        "doc_id long, n_tokens long",
    )
    ctx = 64
    packed = packing.pack_concat_chunks(df, "doc_id", "n_tokens", ctx_len=ctx)
    man = packing.block_manifest(packed, "doc_id", "n_tokens", ctx).collect()
    total = 10 + 100 + 30 + 64 + 7
    by_block: dict[int, list] = {}
    by_doc: dict[int, list] = {}
    for r in man:
        assert r.slice_len > 0
        by_block.setdefault(r.block_id, []).append(r)
        by_doc.setdefault(r.doc_id, []).append(r)
    last_block = max(by_block)
    for b, rows in by_block.items():
        rows.sort(key=lambda r: r.block_offset)
        expect = ctx if b != last_block else total - last_block * ctx
        assert sum(r.slice_len for r in rows) == expect, b
        # contiguous, non-overlapping tiling from offset 0
        pos = 0
        for r in rows:
            assert r.block_offset == pos, (b, r)
            pos += r.slice_len
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.doc_from)
        n = {1: 10, 2: 100, 3: 30, 4: 64, 5: 7}[d]
        assert rows[0].doc_from == 0
        pos = 0
        for r in rows:
            assert r.doc_from == pos
            pos += r.slice_len
        assert pos == n


def test_chunk_text_coverage_and_overlap(spark):
    """Chunking invariants: chunks advance by stride, consecutive chunks
    share exactly overlap words, every token appears in >=1 chunk, the
    tail chunk is short-but-kept, empty docs drop, and a doc shorter
    than one chunk yields itself."""
    words80 = " ".join(f"w{i}" for i in range(80))
    df = spark.createDataFrame(
        [(1, words80), (2, "a b c"), (3, "   ")], "doc_id long, text string"
    )
    out = packing.chunk_text(df, "doc_id", "text", chunk_words=32, overlap_words=8)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    assert {d for (d, _) in rows} == {1, 2}
    # doc 1: stride 24 -> chunks at 0,24,48: [0:32],[24:56],[48:80]
    assert [rows[(1, i)].n_chunk_words for i in range(3)] == [32, 32, 32]
    c0 = rows[(1, 0)].chunk_text.split()
    c1 = rows[(1, 1)].chunk_text.split()
    c2 = rows[(1, 2)].chunk_text.split()
    assert c0 == [f"w{i}" for i in range(32)]
    assert c1[:8] == c0[-8:]  # overlap
    assert c2[-1] == "w79"  # full coverage through the tail
    assert set(c0) | set(c1) | set(c2) == {f"w{i}" for i in range(80)}
    # short doc: one chunk, itself
    assert rows[(2, 0)].chunk_text == "a b c"
    assert rows[(2, 0)].n_chunk_words == 3


def test_mixture_sample_caps_sources_deterministically(spark):
    """Hash-gated mixture sampling: sources over budget are downsampled
    to ~budget expected weight, under-budget sources pass through whole,
    and the kept set is identical across runs and partition layouts
    (same rows, not just same counts)."""
    rows = [(i, "big", 10) for i in range(500)] + [
        (1000 + i, "small", 10) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, src string, w long")
    out1 = packing.mixture_sample(df, "id", "src", "w", budget_per_source=1000)
    kept1 = {r.id for r in out1.collect()}
    # small source (200 weight < 1000 budget): rate 1.0, all kept
    assert {i for i in kept1 if i >= 1000} == {1000 + i for i in range(20)}
    # big source (5000 weight): expected ~1000/5000 = 20% kept -> ~100 docs;
    # hash-binomial, so allow a wide band
    n_big = sum(1 for i in kept1 if i < 1000)
    assert 60 <= n_big <= 140, n_big
    # determinism across partition layout
    out2 = packing.mixture_sample(
        df.repartition(13), "id", "src", "w", budget_per_source=1000
    )
    assert {r.id for r in out2.collect()} == kept1


def test_prefix_sum_no_row_carrying_single_partition(spark, sf_dir):
    """Scale gate: the ROW-side path must shuffle on the bucket key, not
    funnel through Exchange SinglePartition like the naive global window.
    The one SinglePartition exchange in the plan feeds the per-bucket
    TOTALS window (rows = n/bucket_size), below the broadcast join back
    to the row side."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").cast("long").alias("w")
    )
    plan = (
        packing.exclusive_prefix_sum(docs, "doc_id", "w", bucket_size=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # row side: hash exchange on the bucket key + broadcast join of bases
    assert "hashpartitioning(__bucket" in plan
    assert "BroadcastHashJoin" in plan
    # the naive spelling has ZERO hashpartitioning and routes all rows
    # through its single partition; here SinglePartition appears exactly
    # once (bucket totals)
    assert plan.count("SinglePartition") == 1


def test_shuffle_shards_is_deterministic_and_dense(spark):
    """Reproducible pre-training shuffle: same seed → identical
    (shard, shard_pos) regardless of input partitioning; different
    seed → a different order; positions are dense 1..k per shard; the
    plan has no SinglePartition funnel (each window partition is one
    shard)."""
    df = spark.range(0, 2_000).toDF("doc_id")
    out1 = packing.shuffle_shards(df, "doc_id", n_shards=8, seed=7)
    out2 = packing.shuffle_shards(
        df.repartition(13), "doc_id", n_shards=8, seed=7
    )
    rows1 = sorted(
        (r.doc_id, r.shard, r.shard_pos) for r in out1.collect()
    )
    rows2 = sorted(
        (r.doc_id, r.shard, r.shard_pos) for r in out2.collect()
    )
    assert rows1 == rows2
    assert len(rows1) == 2_000

    # dense per-shard positions 1..k
    by_shard: dict = {}
    for _, s, p in rows1:
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == set(range(8))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    # hash balance: no shard more than 2x the fair share
    assert max(len(ps) for ps in by_shard.values()) < 2 * (2_000 / 8)

    # a different seed produces a genuinely different order
    rows3 = sorted(
        (r.doc_id, r.shard, r.shard_pos)
        for r in packing.shuffle_shards(
            df, "doc_id", n_shards=8, seed=8
        ).collect()
    )
    assert rows3 != rows1

    plan = out1._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        packing.shuffle_shards(df, "doc_id", n_shards=0)


def test_budget_select_band_invariance_and_crossing_row(spark):
    """budget_select's result is a pure function of (scores, weights,
    budget) — the internal band count must not change WHICH rows are
    kept (8 vs 32 vs 256 bands identical), the kept set must equal the
    naive global-window spelling, and the budget-crossing row is
    included (prefix-before < budget semantics)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randint(1, 50), round(rng.random(), 6))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, w long, score double")
    budget = 2000.0

    w = Window.orderBy(F.col("score").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = {
        r["id"]
        for r in df.withColumn(
            "before", F.coalesce(F.sum("w").over(w), F.lit(0))
        )
        .filter(F.col("before") < budget)
        .collect()
    }
    kept_w = sum(dict((i, wt) for i, wt, _ in rows)[i] for i in naive)
    assert kept_w >= budget  # the crossing row pushed it over

    for n_bands in (8, 32, 256):
        got = {
            r["id"]
            for r in packing.budget_select(
                df, "id", "w", "score", budget, n_bands=n_bands
            ).collect()
        }
        assert got == naive, n_bands


def test_pps_sample_sub_granularity_rows_stay_sampleable(spark):
    """HT unbiasedness under the 1/65536 discretization requires every
    row to have NONZERO inclusion probability: a row whose p·65536
    floors to 0 is clamped to pg=1 (kept iff its md5 gate is exactly 0,
    probability 1/65536) with ht_weight 65536 — not silently excluded
    from the estimand. Ids 5329/79042 have md5 gate 0, so with a tiny
    target_n forcing p < 1/65536 on the light rows they MUST be kept
    with the clamp (and would be unsampleable without it)."""
    # one heavy row dominates the total; light rows get p << 1/65536
    rows = [(5329, 1), (79042, 1), (7, 1), (11, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = {
        r["doc_id"]: r["ht_weight"]
        for r in packing.pps_sample(df, "doc_id", "w", target_n=1.0).collect()
    }
    # light rows with gate==0 survive at the clamped floor probability
    assert out[5329] == 65536.0
    assert out[79042] == 65536.0
    # light row with nonzero gate is (correctly) not in this realization
    assert 7 not in out
    # the heavy row is kept with near-certainty (p ≈ 1 after the light
    # rows' 3 tokens, pg=65535 → ht=65536/65535)
    assert 11 in out and out[11] < 1.001


def test_weighted_sample_aes_fixed_size_weight_biased_deterministic(spark):
    """Round-16 A-ES sampler: exactly k rows without replacement;
    inclusion tracks weight (a 100:1 weight class dominates the
    sample); the draw is a per-row function of the id so partition
    layout cannot change the sample; zero/NULL/negative weights are
    never sampleable; TakeOrderedAndProject in the plan (top-k, not a
    global sort); k < 1 refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import packing
    from tests.test_plans import plan_str

    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = packing.weighted_sample_aes(df, "id", "w", k=50).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.w == 100.0)
    assert heavy >= 40  # weight-proportional inclusion, deterministic
    # layout-independent: different partitioning, identical sample
    got2 = packing.weighted_sample_aes(
        df.repartition(13, "w"), "id", "w", k=50
    ).collect()
    assert sorted(r.id for r in got) == sorted(r.id for r in got2)
    # unsampleable weights
    bad = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, None), (4, 2.0)], "id long, w double"
    )
    kept = packing.weighted_sample_aes(bad, "id", "w", k=10).collect()
    assert [r.id for r in kept] == [4]
    # population smaller than k: all sampleable rows, no crash
    assert len(
        packing.weighted_sample_aes(df.limit(5), "id", "w", k=50).collect()
    ) == 5
    plan = plan_str(packing.weighted_sample_aes(df, "id", "w", k=50))
    assert "TakeOrderedAndProject" in plan
    with _pytest.raises(ValueError, match="k >= 1"):
        packing.weighted_sample_aes(df, "id", "w", k=0)
