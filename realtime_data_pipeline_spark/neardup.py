"""Near-duplicate text detection (X2): n-gram Jaccard, MinHash-LSH, SimHash.

Pipeline shape (the only one that survives 100 TB):

    shingle -> signature -> band -> equi-join buckets -> exact verify

All-pairs comparison is O(N²) and never materialized; candidate volume is
controlled by (bands × rows-per-band) and every join is an equi-join on a
short key that AQE can re-plan. The exact verify step re-checks candidates
with true Jaccard, so false positives from banding cost only compute, not
correctness.

Shingling, hashing, and MinHash permutations are pure JVM column
expressions (xxhash64 + universal hashing `(a·h + b) mod p` over 32-bit
folded hashes — products stay < 2^63, no overflow). SimHash bit-folding is
the one numpy step (Arrow-batched pandas UDF), because per-bit expression
trees would interpret 64 × n_shingles element hops per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from realtime_data_pipeline_spark import ops

# Universal-hash modulus: smallest prime > 2^32.
_P = 4_294_967_311
_MASK32 = 0xFFFFFFFF


def word_shingles(text: Column, n: int = 3) -> Column:
    """Overlapping word n-grams; empty array when the text is shorter than
    n words (guard matters: Spark `sequence(1, 0)` would count DOWN)."""
    toks = F.split(F.trim(text), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingle_hashes(shingles: Column) -> Column:
    """xxhash64 per shingle, folded to 32 bits so downstream universal
    hashing can't overflow a long."""
    return F.transform(shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(_MASK32)))


def gram_hashes(text: Column, n: int = 3) -> Column:
    """Distinct hashed word n-grams as 32-bit-folded longs — the working
    set the near-dup pipelines carry instead of gram STRINGS: set-Jaccard
    over the hashes equals string-set Jaccard up to ~n_grams²/2³²
    collisions per doc pair (negligible), and the long arrays are far
    cheaper to shuffle through the candidate/verify joins.

    (An arithmetic token-hash combine was measured SLOWER here: a shared
    token-hash subexpression gets re-inlined into every element_at, going
    O(grams × tokens). One hash per gram string wins.)"""
    return F.array_distinct(shingle_hashes(word_shingles(text, n)))


def _hash_params(k: int, seed: int) -> list[tuple[int, int]]:
    rs = np.random.RandomState(seed)
    return [
        (int(rs.randint(1, 1 << 31)), int(rs.randint(0, 1 << 31)))
        for _ in range(k)
    ]


def minhash_signature_udf(k: int = 64, seed: int = 42):
    """k-permutation MinHash over an array<long> of (32-bit-folded) shingle
    hashes → array<long> signature. Arrow-batched numpy: one (n_shingles, k)
    broadcasted multiply-mod-min per row, ~10× faster than a k-deep
    higher-order-function expression tree that the JVM interprets
    element-at-a-time. Products stay < 2^63 (h < 2^32, a < 2^31).
    Empty-shingle rows get the sentinel signature [_P]*k as a guard; the
    pipeline filters them out BEFORE banding (identical sentinels would
    otherwise share every band key — an m² hot bucket).
    Closure is self-contained (library imports + captured ndarrays only) so
    any Python worker can unpickle it."""
    params = np.array(_hash_params(k, seed), dtype=np.int64)
    a_row = params[:, 0][None, :]
    b_row = params[:, 1][None, :]
    p = _P

    @pandas_udf("array<long>")
    def _mh(hash_arrays: pd.Series) -> pd.Series:
        sentinel = np.full(a_row.shape[1], p, dtype=np.int64)
        out = []
        for arr in hash_arrays:
            if arr is None or len(arr) == 0:
                out.append(sentinel)
                continue
            h = np.asarray(arr, dtype=np.int64)[:, None]  # (n, 1)
            out.append(((h * a_row + b_row) % p).min(axis=0))
        return pd.Series(out)

    return _mh


def minhash_est_jaccard(sig_a: Column, sig_b: Column, k: int) -> Column:
    """Fraction of agreeing signature positions — unbiased Jaccard estimate."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                            lambda v: v))
    return agree / F.lit(float(k))


def exact_jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact distinct-set Jaccard (array_intersect/array_union are
    set-semantics builtins). 0.0 when both sides are empty."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(F.array_union(shingles_a, shingles_b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def prefix_jaccard_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """EXACT all-pairs set-similarity join above a Jaccard threshold via
    PREFIX FILTERING (Chaudhuri et al. ICDE'06 / Bayardo et al. WWW'07
    — the ssjoin answer when MinHash-LSH's recall < 1 is not
    acceptable: legal dedup, benchmark decontamination audits, exact
    plagiarism sweeps). Returns every pair ``(id_a, id_b, jaccard)``
    with ``id_a < id_b`` and distinct-``n``-shingle Jaccard ≥ ``tau`` —
    the same pair set the quadratic cross join produces, at candidate
    cost instead of corpus².

    Why it is complete (recall exactly 1.0): order every shingle by a
    GLOBAL total order (rarity first: ascending document frequency,
    hash tiebreak) and give each document's sorted shingle set a prefix
    of its first ``|d| − ⌈tau·|d|⌉ + 1`` elements. If two docs have
    J ≥ tau their overlap is ≥ tau·max(|a|,|b|), and the classic
    argument shows their PREFIXES must share at least one element —
    so emitting candidates only for prefix-shared shingles misses
    nothing, while the rarity-first order makes the shared element as
    selective as possible (candidate volume rides the rarest shingles'
    document frequencies, not the vocabulary's hot head).

    Scale shape: shingles travel as xxhash64 longs (documented benign
    collision bound vs string semantics); the df table is one groupBy
    over 8-byte keys; per-doc sorting is a per-row ``array_sort`` over
    (df, hash) structs — no rank window, no global sort; candidates are
    one self-equi-join on the prefix-shingle key with the triangle cut
    in the join condition; each candidate pair verifies with the exact
    array-intersection Jaccard. No cross product anywhere (plan-gated
    in tests)."""
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    els = docs.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
            )
        ).alias("__els"),
    ).filter(F.size("__els") > 0)
    flat = els.select(id_col, F.explode("__els").alias("__e"))
    df_tbl = flat.groupBy("__e").agg(F.count(F.lit(1)).alias("__df"))
    # per-doc global-order sort: array_sort over (df, hash) structs —
    # struct comparison is field-lexicographic, so rarest-first with a
    # deterministic hash tiebreak, computed per row (never a window)
    ranked = (
        flat.join(df_tbl, "__e")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("__e")))
            ).alias("__sorted")
        )
    )
    sz = F.size("__sorted")
    prefix_len = (sz - F.ceil(sz * F.lit(float(tau))) + 1).cast("int")
    prefix = ranked.select(
        F.col(id_col),
        F.transform(
            F.slice("__sorted", 1, prefix_len), lambda s: s["__e"]
        ).alias("__prefix"),
    ).select(id_col, F.explode("__prefix").alias("__e"))
    cand = (
        prefix.select(F.col(id_col).alias("__id_a"), "__e")
        .join(
            prefix.select(F.col(id_col).alias("__id_b"), "__e"),
            "__e",
        )
        .filter(F.col("__id_a") < F.col("__id_b"))
        .select("__id_a", "__id_b")
        .distinct()
    )
    ea = els.select(F.col(id_col).alias("__id_a"), F.col("__els").alias("__ea"))
    eb = els.select(F.col(id_col).alias("__id_b"), F.col("__els").alias("__eb"))
    return (
        cand.join(ea, "__id_a")
        .join(eb, "__id_b")
        .select(
            F.col("__id_a").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            F.round(exact_jaccard(F.col("__ea"), F.col("__eb")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= tau)
    )


def _banded(sig_df: DataFrame, id_col: str, n_bands: int, r: int) -> DataFrame:
    return sig_df.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "-", F.slice(F.col("__sig"), b * r + 1, r)
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("__band"),
    ).select(id_col, "__band.band_id", "__band.band_key")


def neardup_pairs_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 64,
    n_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Returns (id_a, id_b, est_jaccard, jaccard) for candidate pairs whose
    EXACT n-gram Jaccard ≥ threshold, id_a < id_b. Band geometry: collision
    probability for true Jaccard j is 1-(1-j^r)^b with r = k/n_bands.
    """
    r = k // n_bands
    # Docs too short to shingle can never reach the Jaccard threshold
    # (union > 0, intersect = 0) — drop them BEFORE banding, where their
    # shared sentinel signature would otherwise put all of them into the
    # same bucket in every band (an m² hot key for m empty docs).
    # The predicate is the cheap token-count PRECONDITION (≥ n tokens ⟺ at
    # least one gram), NOT size(gram_hashes(..)) > 0: Catalyst pushes
    # filters below the spread() exchange into the scan stage, and a
    # filter spelled over the gram expression would re-evaluate the whole
    # shingle+hash tree there — single-threaded when the input is one
    # parquet split, and a second time above the exchange for the
    # projection (measured 5× the hashing cost at sf0.1).
    has_grams = F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n
    # __sh holds hashed grams (longs), not gram strings: the verify joins
    # below shuffle this column twice, and exact Jaccard over the hashed
    # sets equals string-set Jaccard up to negligible 32-bit collisions
    base = ops.spread(df.filter(has_grams), id_col).select(
        F.col(id_col),
        gram_hashes(F.col(text_col), n).alias("__sh"),
    )
    sigs = base.select(
        id_col,
        "__sh",
        minhash_signature_udf(k, seed)(F.col("__sh")).alias("__sig"),
    )
    # the signature table feeds banding AND both verify sides — persist and
    # materialize eagerly so shingling+hashing runs exactly once (a lazy
    # persist lets the join's build and probe sides race to compute it
    # concurrently). At scale this is the signature table you would
    # checkpoint to storage.
    sigs = sigs.persist()
    sigs.count()
    bands = _banded(sigs, id_col, n_bands, r)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col(id_col).alias("id_a"),
        F.col("__sh").alias("__sh_a"),
        F.col("__sig").alias("__sig_a"),
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"),
        F.col("__sh").alias("__sh_b"),
        F.col("__sig").alias("__sig_b"),
    )
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                minhash_est_jaccard(F.col("__sig_a"), F.col("__sig_b"), k), 4
            ).alias("est_jaccard"),
            F.round(exact_jaccard(F.col("__sh_a"), F.col("__sh_b")), 4).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # materialize the (candidate-bounded, small) verified pairs, then
    # release the corpus-sized signature cache — callers hold only the
    # result, not the working set
    verified = verified.persist()
    verified.count()
    sigs.unpersist()
    return verified


def incremental_neardup_minhash(
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 64,
    n_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> tuple[DataFrame, dict]:
    """X2 daily shape: near-dedup a NEW batch against a persisted
    signature index instead of re-running LSH over the corpus. A 100 TB
    corpus is deduped once; every incoming batch then costs (batch LSH +
    two corpus STREAMING passes) — never a corpus self-join.

    Index layout: ``{index}/sigs`` (id, sh, sig) and ``{index}/bands``
    (id, band_id, band_key). The batch side is BROADCAST into both
    corpus-side joins (band match, then signature verify), so the corpus
    tables stream map-side with zero exchange — the asymmetry (batch ≪
    corpus) is the entire point; for corpus-sized "batches" run the full
    :func:`neardup_pairs_minhash` instead.

    Steps: (1) in-batch near-dedup (full LSH pipeline on the small
    batch, lowest id kept); (2) survivors' band keys probe the index
    bands, candidates verified by exact hashed-gram Jaccard against the
    index signatures — batch docs matching the corpus are dropped;
    (3) the remaining docs' signatures and bands are appended to the
    index (materialized first, so the result can't observe its own
    write). Replaying a batch finds every doc already in the index
    (Jaccard 1.0 with itself) and appends nothing. Docs too short to
    shingle can never match anything: passed through as fresh, not
    indexed.

    Returns ``(fresh_docs, metrics)``.
    """
    import os

    from realtime_data_pipeline_spark import dedup as _dedup

    spark = new_docs.sparkSession
    r = k // n_bands
    has_grams = F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n
    eligible = new_docs.filter(has_grams)
    short_docs = new_docs.filter(~has_grams)

    in_batch_pairs = neardup_pairs_minhash(
        eligible, id_col, text_col, n=n, k=k, n_bands=n_bands,
        threshold=threshold, seed=seed,
    )
    batch_kept = _dedup.drop_neardups(eligible, in_batch_pairs, id_col)
    # metric counts ride on work already paid for: one combined agg
    # splits the batch into eligible/short (was two separate scans),
    # and n_batch_kept == sigs.count() — the signature table below has
    # exactly one row per kept eligible doc and must be materialized
    # anyway, so the separate batch_kept.count() action is free to drop
    # NULL text makes has_grams NULL (size(split(NULL)) is NULL), so such
    # rows flow through NEITHER filter above — count shorts explicitly as
    # "definitively not enough grams" so the metrics match the rows that
    # actually flow through (ADVICE r16: __total - __elig silently folded
    # null-text rows into n_short)
    _split = new_docs.agg(
        F.sum(has_grams.cast("long")).alias("__elig"),
        F.sum(
            (~F.coalesce(has_grams, F.lit(True))).cast("long")
        ).alias("__short"),
    ).first()
    n_eligible = int(_split["__elig"] or 0)
    n_short = int(_split["__short"] or 0)

    sigs = (
        ops.spread(batch_kept, id_col)
        .select(
            F.col(id_col), gram_hashes(F.col(text_col), n).alias("__sh")
        )
        .select(
            id_col,
            "__sh",
            minhash_signature_udf(k, seed)(F.col("__sh")).alias("__sig"),
        )
        .persist()
    )
    n_batch_kept = sigs.count()
    bands_new = _banded(sigs, id_col, n_bands, r)

    sig_dir, band_dir = f"{index_path}/sigs", f"{index_path}/bands"
    if os.path.exists(sig_dir):
        idx_sigs = spark.read.parquet(sig_dir)
        idx_bands = spark.read.parquet(band_dir)
        cand = (
            idx_bands.join(
                F.broadcast(
                    bands_new.select(
                        F.col(id_col).alias("new_id"), "band_id", "band_key"
                    )
                ),
                ["band_id", "band_key"],
            )
            .select(F.col(id_col).alias("old_id"), "new_id")
            .distinct()
        )
        corpus_dups = (
            idx_sigs.select(
                F.col(id_col).alias("old_id"), F.col("sh").alias("__sh_old")
            )
            .join(F.broadcast(cand), "old_id")
            .join(
                F.broadcast(
                    sigs.select(
                        F.col(id_col).alias("new_id"),
                        F.col("__sh").alias("__sh_new"),
                    )
                ),
                "new_id",
            )
            .filter(
                exact_jaccard(F.col("__sh_old"), F.col("__sh_new"))
                >= threshold
            )
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        fresh_core = batch_kept.join(corpus_dups, id_col, "left_anti")
    else:
        fresh_core = batch_kept
    fresh_core = fresh_core.localCheckpoint(eager=True)
    n_fresh_core = fresh_core.count()

    if n_fresh_core:
        fresh_sigs = (
            sigs.join(F.broadcast(fresh_core.select(id_col)), id_col)
            .select(
                F.col(id_col),
                F.col("__sh").alias("sh"),
                F.col("__sig").alias("sig"),
            )
            .localCheckpoint(eager=True)
        )
        fresh_sigs.write.mode("append").parquet(sig_dir)
        _banded(
            fresh_sigs.select(
                id_col,
                F.col("sh").alias("__sh"),
                F.col("sig").alias("__sig"),
            ),
            id_col,
            n_bands,
            r,
        ).write.mode("append").parquet(band_dir)
    sigs.unpersist()

    fresh = fresh_core.unionByName(short_docs)
    # metrics reuse the counts already taken above — never
    # new_docs.count() + fresh.count(), which would re-scan the batch
    # twice more (a daily batch at corpus scale is not free to scan)
    return fresh, {
        "batch_rows": n_eligible + n_short,
        "in_batch_dropped": n_eligible - n_batch_kept,
        "corpus_dups": n_batch_kept - n_fresh_core,
        "fresh_rows": n_fresh_core + n_short,
    }


def simhash_udf():
    """array<long> shingle hashes -> 64-bit SimHash (bigint). One numpy
    pass per Arrow batch: per-bit ±1 votes summed over shingles, sign
    packed back into an int64."""
    weights = 1 << np.arange(64, dtype=np.uint64)

    @pandas_udf("bigint")
    def _simhash(hash_arrays: pd.Series) -> pd.Series:
        out = np.empty(len(hash_arrays), dtype=np.int64)
        for i, arr in enumerate(hash_arrays):
            if arr is None or len(arr) == 0:
                out[i] = 0
                continue
            # int64 -> uint64 via astype: two's-complement wrap keeps all
            # 64 bits of full-width xxhash64 values (asarray(uint64)
            # rejects negatives)
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int32
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = (weights[votes >= 0]).sum().astype(np.uint64).view(np.int64)
        return pd.Series(out)

    return _simhash


def neardup_pairs_simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, ``n_bands`` equal bit
    slices joined as band keys, exact hamming verify via bit_count(xor).

    Pigeonhole guarantee: any pair with hamming ≤ ``n_bands - 1`` must
    agree on ≥1 band and is found; pairs between that and ``max_hamming``
    are found probabilistically. The default 4×16 geometry is the standard
    web-dedup setting (hamming ≤ 3 over 64 bits); widening ``n_bands``
    trades candidate volume (coarser 64/n_bands-bit keys → bigger buckets)
    for a wider guarantee.

    Only the 8-byte fingerprint and short band keys ever shuffle — the
    shingle hash set stays in its map task.
    """
    fp = simhash_fingerprints(df, id_col, text_col, n)
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = fp.select(
        id_col,
        "__fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("__fp"), width * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("__band"),
    ).select(id_col, "__fp", "__band.band_id", "__band.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.__fp").bitwiseXOR(F.col("b.__fp"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, __fp) 64-bit SimHash fingerprints. FULL-WIDTH xxhash64 gram
    hashes — the 32-bit fold that protects MinHash's universal hashing
    from overflow would zero SimHash bits 32-63, making the high bands
    constant (one global bucket = the all-pairs product). Short docs are
    dropped for the same hot-bucket reason as in the MinHash path (their
    shared fp 0 would collide in every band)."""
    # token-count precondition instead of size(__h) > 0 — same pushdown
    # rationale as in neardup_pairs_minhash (a filter over the shingle
    # expression would be pushed into the scan stage and re-evaluated)
    has_grams = F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n
    sh = ops.spread(df.filter(has_grams), id_col).select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
            )
        ).alias("__h"),
    )
    return sh.select(id_col, simhash_udf()(F.col("__h")).alias("__fp"))
