"""Sequence packing for LLM training-data assembly.

The standard pretraining data layout concatenates the (ordered) token
streams of all documents and slices the result into fixed-length context
blocks ("concat-then-chunk", the GPT-2/3 recipe): no padding waste, docs
may straddle block boundaries. Assigning every document its block span
requires each doc's GLOBAL token offset — an exclusive prefix sum over
the corpus in a deterministic order.

The naive Spark spelling — ``F.sum(w).over(Window.orderBy(id))`` with no
partition key — collapses the whole corpus into ONE task (Catalyst plans
an ``Exchange SinglePartition`` under the window): the classic driver-
shaped bottleneck that works at sf0.1 and dies at 100 TB. This module
implements the two-level distributed prefix sum instead:

1. rows bucket by ``floor(order/bucket_size)`` — deterministic, data-
   independent (unlike ``spark_partition_id``), so results are stable
   across partition layouts and engines;
2. ONE shuffle on the bucket key computes the within-bucket running sum
   (window) and per-bucket totals (agg) from the same exchange;
3. bucket totals (corpus_rows / bucket_size rows — tiny) prefix-sum on
   a single small partition, then broadcast-join back as each bucket's
   base offset.

Global offset = bucket base + within-bucket running sum. The only
corpus-sized movement is the one bucket-key shuffle; the single-
partition step touches bucket TOTALS, never rows. Deterministic given
distinct integer ``order_col`` values (bucket membership and within-
bucket order are both value-derived).

No counterpart exists in the reference (single-table ETL —
``spark_jobs/batch_etl.py``); this extends the LLM-data surface
(SURVEY.md §2.9) the same way dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "offset",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Add ``out_col`` = sum of ``weight_col`` over all rows STRICTLY
    before this one in ``order_col`` order (exclusive prefix sum), via
    the two-level shape described in the module docstring.

    ``order_col`` must be distinct integers (a doc id); ``bucket_size``
    caps rows per bucket (ids need not be contiguous — gaps only make
    buckets smaller). Equivalent to the SQL window
    ``SUM(w) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)`` — which Spark would execute on one task; this version
    shuffles once on the bucket key instead (plan-gated: no
    row-carrying ``Exchange SinglePartition``).
    """
    bucket = F.floor(F.col(order_col) / F.lit(bucket_size)).alias("__bucket")
    rows = df.withColumn("__bucket", bucket)
    in_bucket = Window.partitionBy("__bucket").orderBy(order_col)
    # running sum INCLUDING current row, minus own weight = exclusive sum;
    # rowsBetween(unboundedPreceding, -1) would be one frame-spec cheaper
    # to read but NULLs the first row, costing a coalesce anyway
    local = F.sum(weight_col).over(in_bucket) - F.col(weight_col)
    # per-bucket totals: tiny (n_rows / bucket_size); exclusive-prefix-sum
    # THEM on a single partition — totals, never rows
    totals = rows.groupBy("__bucket").agg(
        F.sum(weight_col).alias("__bucket_total")
    )
    base = (
        totals.withColumn(
            "__base",
            F.coalesce(
                F.sum("__bucket_total").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bucket", "__base")
    )
    return (
        rows.withColumn("__local", local)
        .join(F.broadcast(base), "__bucket")
        .withColumn(out_col, (F.col("__base") + F.col("__local")).cast("long"))
        .drop("__bucket", "__local", "__base")
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int,
    overlap_words: int = 0,
) -> DataFrame:
    """Overlapping sliding-window chunking (retrieval/RAG prep): split
    each document's whitespace tokens into windows of ``chunk_words``
    advancing by ``chunk_words - overlap_words``, rejoined to text.
    Every token lands in ≥1 chunk; consecutive chunks share
    ``overlap_words`` tokens so no retrieval boundary splits context.

    Pure JVM higher-order functions (split / sequence / slice /
    array_join) exploded per chunk — narrow, zero shuffle, whole-stage
    codegen; chunk count ≈ corpus_tokens / stride rows out. Documents
    with no tokens are dropped. The last chunk is the final ≤chunk_words
    tokens (short tail kept, never padded).

    Returns (id, chunk_idx, n_chunk_words, chunk_text).
    """
    if not 0 <= overlap_words < chunk_words:
        raise ValueError("need 0 <= overlap_words < chunk_words")
    stride = chunk_words - overlap_words
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # chunks = 1 + ceil(max(0, n - chunk) / stride) without a ceil():
    # floor((max0 + stride - 1) / stride)
    extra = F.greatest(n - F.lit(chunk_words), F.lit(0))
    n_chunks = (
        F.lit(1) + F.floor((extra + F.lit(stride - 1)) / F.lit(stride))
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias(
        "chunk_idx"
    )
    # guard on the trimmed TEXT, not size(toks): split('') yields ['']
    # (size 1), so a whitespace-only doc would emit one empty chunk
    staged = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), toks.alias("__toks"), idx
    )
    piece = F.slice(
        F.col("__toks"),
        F.col("chunk_idx") * F.lit(stride) + F.lit(1),
        F.lit(chunk_words),
    )
    return staged.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_chunk_words"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def budget_select(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    score_col: str,
    budget: float,
    n_bands: int = 32,
) -> DataFrame:
    """Budget-constrained selection: keep the best-scoring rows until the
    cumulative weight crosses ``budget`` (the crossing row included) —
    "give me the best 1B tokens", the corpus-selection step after
    scoring and before assembly. Semantics are exactly the global
    prefix rule ``SUM(w) OVER (ORDER BY score DESC, id ASC ...
    1 PRECEDING) < budget``.

    Scale spelling — NO global sort/window (the SQL window funnels the
    corpus through one task): scores in [0, 1] are floor-banded into
    ``n_bands`` buckets, the per-band token totals (≤ n_bands+1 rows)
    prefix-sum on a sketch-sized window, and each row needs only its
    band's carried-in offset plus a within-band exclusive prefix
    (window partitioned BY band). Floor-banding is monotone in the
    score, so band-major order ≡ global (score desc, id) order and the
    decomposition is PROVEN against the textbook window by the oracle.
    Skewed score distributions concentrate rows in few bands — raise
    ``n_bands`` as the corpus grows, the same dial as every banded
    operator here."""
    from pyspark.sql.window import Window as W

    banded = df.withColumn(
        "__band",
        F.floor(F.col(score_col) * F.lit(n_bands)).cast("long"),
    )
    totals = banded.groupBy("__band").agg(
        F.sum(F.col(weight_col).cast("long")).alias("__btot")
    )
    higher = (
        W.orderBy(F.col("__band").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    base = totals.select(
        "__band",
        F.coalesce(F.sum("__btot").over(higher), F.lit(0)).alias("__base"),
    )
    in_band = (
        W.partitionBy("__band")
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = F.col("__base") + F.coalesce(
        F.sum(F.col(weight_col).cast("long")).over(in_band), F.lit(0)
    )
    return (
        banded.join(F.broadcast(base), "__band")
        .withColumn("__before", before)
        .filter(F.col("__before") < F.lit(float(budget)))
        .drop("__band", "__base", "__before")
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight_col: str,
    target_total: float,
) -> DataFrame:
    """Temperature-based source mixing at α = 0.5: per-source keep rate
    ``min(1, target · √T_s / (T_s · Σ√T_t))`` — sampled mass per source
    ∝ √(its size), the classic multilingual/multi-domain rebalancing
    (small sources upweighted relative to their share, large sources
    capped) with the total steered to ``target_total``. α is PINNED at
    0.5 because √ is IEEE-exact in every engine, keeping the operator
    oracle-checkable; a general-α variant would ride ``pow`` (1-ulp
    engine drift) and belongs rows-only. Same deterministic md5 gate
    and two-pass shape as :func:`mixture_sample`: one tiny per-source
    aggregate broadcast back, then a per-row projection."""
    totals = df.groupBy(source_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__total")
    )
    denom = totals.agg(
        F.sum(F.sqrt(F.col("__total"))).alias("__denom")
    )
    rates = totals.crossJoin(F.broadcast(denom)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(target_total))
            * F.sqrt(F.col("__total"))
            / (F.col("__total") * F.col("__denom")),
        ).alias("__rate"),
    )
    gate = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(gate < F.floor(F.col("__rate") * 65536))
        .drop("__rate")
    )


def pps_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    target_n: float,
) -> DataFrame:
    """Poisson PPS (probability-proportional-to-size) sample: keep row i
    with probability ``p_i = min(1, target_n · w_i / Σw)``, decided by
    the same deterministic md5 hash gate as :func:`mixture_sample`, and
    attach the Horvitz-Thompson correction ``ht_weight = 1/p_i`` so any
    downstream SUM over the sample times ``ht_weight`` is an unbiased
    estimate of the population total. This is importance sampling for a
    training-data pipeline: long documents (heavy w) are kept with
    certainty, short ones proportionally, and token-weighted statistics
    computed on the ~target_n-row sample stay unbiased.

    Scale shape: ONE tiny total aggregate broadcast back (the only
    shuffle carries one row per partition), then the gate and the HT
    weight are pure per-row projections over the scan. Expected sample
    size ≈ target_n (Poisson, not fixed-size — the deterministic analog
    of a PPS without-replacement design; capped rows with w ≥ Σw /
    target_n make the realized expectation slightly smaller, the
    standard Poisson-PPS property). Every arithmetic step is IEEE
    +,·,/ and LEAST — no transcendental — so the kept set and the
    round-6 weights are engine-exact."""
    total = df.agg(
        F.sum(F.col(weight_col).cast("long")).alias("__total")
    )
    p = F.least(
        F.lit(1.0),
        F.lit(float(target_n)) * F.col(weight_col) / F.col("__total"),
    )
    gate = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    # the gate realizes inclusion prob floor(p·65536)/65536 (1/65536
    # granularity), so the HT weight inverts THAT — the estimator stays
    # exactly unbiased under the discretization. The floor is clamped to
    # 1: without it a row with p < 1/65536 would have inclusion
    # probability ZERO (the gate is never < 0) and the population total
    # would be biased down by exactly that mass on large skewed corpora;
    # clamped, such rows keep probability 1/65536 with ht_weight 65536.
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn(
            "__pg",
            F.greatest(F.lit(1), F.floor(p * 65536)).cast("long"),
        )
        .filter(gate < F.col("__pg"))
        .withColumn(
            "ht_weight",
            F.round(F.lit(65536.0) / F.col("__pg"), 6),
        )
        .drop("__total", "__pg")
    )


def weighted_sample_aes(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """FIXED-SIZE weighted sample without replacement — the
    Efraimidis–Spirakis A-ES design (IPL 2006): each row draws
    ``u_i ∈ (0,1)`` and scores ``key_i = u_i^(1/w_i)``; the k largest
    keys are a without-replacement sample where inclusion tracks
    weight. The deterministic complement to :func:`pps_sample`
    (Poisson: EXPECTED size target_n, rows independent) — use A-ES
    when the contract is "exactly k rows" (eval sets, fixed-budget
    audits), PPS when unbiased HT totals matter more than exact size.

    Determinism: ``u_i`` is the first 8 md5 hex chars of the id
    (+0.5, /2^32 — never 0 or 1), and the rank key is the MONOTONE
    log form ``ln(u_i)/w_i`` ROUNDED to 1e-6 with the id as
    tie-break, so both engines pick the identical k rows (the repo's
    rank-on-the-rounded-score rule; the 1e-6 grid absorbs the ≤1-ulp
    cross-engine ``ln`` scatter). Rows with NULL or non-positive
    weight can never be sampled and are excluded up front.

    Scale shape: one per-row projection (md5 + ln) over the scan,
    then top-k = TakeOrderedAndProject — no global sort, no shuffle
    beyond the k-row reduction."""
    if k < 1:
        raise ValueError(f"weighted_sample_aes requires k >= 1, got {k}")
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.round(
        F.log(u) / F.col(weight_col).cast("double"), 6
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("aes_key", key)
        .orderBy(F.col("aes_key").desc(), F.col(id_col))
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight_col: str,
    budget_per_source: float,
) -> DataFrame:
    """Domain-mixing subsample: cap every source at ``budget_per_source``
    total weight (tokens) by keeping each row with probability
    ``min(1, budget / source_total)`` — decided by a DETERMINISTIC hash
    gate, not an RNG, so the sample is identical across runs, engines,
    partition layouts, and re-shards (the property RNG `sample()` loses
    the moment parallelism changes).

    Gate: first 4 hex chars of ``md5(id)`` as an integer in [0, 65536),
    kept iff `` < floor(rate * 65536)`` — rate granularity 1/65536,
    cross-engine exact (md5 and IEEE-754 double math match everywhere).
    Rates come from one small per-source aggregate broadcast-joined back
    (two passes over the input by construction: you cannot know a
    source's total while gating on it). Expected sampled weight per
    source ≈ budget (hash-binomial, not exact-cap; for a hard cap,
    window-rank within source by the same hash and cut at the budget —
    one extra shuffle).
    """
    rates = (
        df.groupBy(source_col)
        .agg(F.sum(weight_col).alias("__total"))
        .select(
            source_col,
            F.least(
                F.lit(1.0), F.lit(float(budget_per_source)) / F.col("__total")
            ).alias("__rate"),
        )
    )
    gate = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(gate < F.floor(F.col("__rate") * 65536))
        .drop("__rate")
    )


def mixture_sample_exact(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight_col: str,
    budget_per_source: float,
) -> DataFrame:
    """Hard-cap variant of :func:`mixture_sample`: rows are ranked within
    each source by the same md5 hash (deterministic, unbiased by any data
    column) and kept while the running weight stays ≤ budget — plus the
    first row that crosses it, so every source with data gets at least
    one row and the cap is "first cumulative prefix reaching budget".
    One shuffle (window by source); expected skew bounded by the largest
    single source, same as any per-source window. Use when the binomial
    scatter of the hash gate around the budget is unacceptable
    (per-source budgets small enough that ±√n matters)."""
    h = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    return (
        df.withColumn("__before", before)
        .filter(F.col("__before") < budget_per_source)
        .drop("__before")
    )


def block_manifest(
    packed: DataFrame,
    id_col: str,
    weight_col: str,
    ctx_len: int,
) -> DataFrame:
    """Writer input for :func:`pack_concat_chunks`: explode each doc's
    block span into one row per (block, doc) slice —
    ``(block_id, doc, doc_from, slice_len, block_offset)`` says "block
    B's tokens [block_offset, block_offset+slice_len) come from doc D's
    tokens [doc_from, doc_from+slice_len)". A writer materializing block
    B selects its manifest rows, fetches the doc token slices, and
    concatenates by ``block_offset`` — embarrassingly parallel over
    blocks. The explode emits ``blocks_spanned`` rows per doc (total ≈
    corpus_tokens / ctx_len + n_docs), narrow — no shuffle beyond what a
    downstream ``repartition(block_id)`` writer adds."""
    block = F.explode(
        F.sequence(F.col("start_block"), F.col("end_block"))
    ).alias("block_id")
    out = packed.select(
        F.col(id_col), F.col(weight_col), "offset", block
    )
    block_start = F.col("block_id") * ctx_len
    block_end = block_start + ctx_len  # exclusive
    doc_end = F.col("offset") + F.col(weight_col)
    slice_from = F.greatest(F.col("offset"), block_start)
    slice_to = F.least(doc_end, block_end)
    return out.select(
        "block_id",
        id_col,
        (slice_from - F.col("offset")).cast("long").alias("doc_from"),
        (slice_to - slice_from).cast("long").alias("slice_len"),
        (slice_from - block_start).cast("long").alias("block_offset"),
    )


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    ctx_len: int,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Concat-then-chunk packing layout: given per-doc token counts
    (``weight_col``), assign each document its span in the stream of
    fixed-size context blocks. Zero-token docs contribute nothing and
    are dropped (they would claim a phantom block slot).

    Output columns (per doc): ``offset`` (global token offset),
    ``start_block`` / ``start_offset`` (block index and position where
    the doc begins), ``end_block`` (block where its last token lands),
    ``blocks_spanned``. A writer materializing block N selects
    ``start_block <= N <= end_block`` — at scale, range-partition by
    ``start_block`` so each writer task reads a contiguous doc slice.
    """
    w = F.col(weight_col)
    out = exclusive_prefix_sum(
        df.filter(w > 0), id_col, weight_col, out_col="offset",
        bucket_size=bucket_size,
    )
    start = F.floor(F.col("offset") / ctx_len).cast("long")
    end = F.floor((F.col("offset") + w - 1) / ctx_len).cast("long")
    return (
        out.withColumn("start_block", start)
        .withColumn(
            "start_offset", (F.col("offset") % ctx_len).cast("long")
        )
        .withColumn("end_block", end)
        .withColumn(
            "blocks_spanned", (end - start + F.lit(1)).cast("long")
        )
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    order_alias: str = "shard_pos",
    shard_alias: str = "shard",
    stage_col: str | None = None,
) -> DataFrame:
    """Reproducible global shuffle for training-data assembly: assign
    every row a shard and a dense within-shard position that together
    define a pseudo-random total order — the "shuffle the corpus before
    training" step, without RNG state (rerunnable, engine-deterministic,
    invariant to input partitioning).

    shard = pmod(xxhash64(id, seed), n_shards); within-shard order =
    (xxhash64(id, seed+1), id) — two independent hash draws so shard
    membership and intra-shard order are uncorrelated, the id tiebreak
    makes the order total even under (astronomically unlikely) hash
    collisions.

    Scale shape: ONE shuffle (the window's hash partition on the shard
    key) and a per-shard local sort; each window partition IS one
    shard, so size n_shards to the shard you want on disk (1-4 GB) and
    write with ``partitionBy(shard)``. The global-orderBy spelling
    would range-sample and sort the whole corpus for an order nobody
    reads back; this gives the same statistical shuffle for one
    hash-partition exchange. The oracle-checkable query twin
    (``docs_shuffle_shards``) spells the same construction over md5 hex
    (cross-engine stable); this library version uses xxhash64 (JVM
    codegen, no string materialization) — same contract, faster hash.

    ``stage_col`` (curriculum mode, same construction as the
    ``docs_curriculum_order`` query): the within-shard positions
    restart per (stage, shard) instead of per shard, so a stage-major
    consumption order (stage asc, then shard-parallel) is still dense
    per shard file — the window partition count becomes
    stages × n_shards, still bounded and corpus-size-independent.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.pmod(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)
    ).cast("int")
    order_h = F.xxhash64(F.col(id_col), F.lit(seed + 1))
    parts = ([stage_col] if stage_col else []) + [shard_alias]
    w = Window.partitionBy(*parts).orderBy(
        order_h, F.col(id_col)
    )
    return (
        df.withColumn(shard_alias, shard)
        .withColumn(order_alias, F.row_number().over(w))
    )
