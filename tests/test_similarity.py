"""X3 quality gates the oracle can't express: LSH recall vs the exact
brute-force baseline, and cosine sanity properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark import similarity
from realtime_data_pipeline_spark.queries import vectors
import pytest


def test_cosine_self_similarity_is_one(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    vec = similarity.as_double_array(F.col("embedding"))
    rows = emb.select(
        F.round(similarity.cosine(vec, vec), 6).alias("self_sim")
    ).collect()
    assert rows and all(abs(r.self_sim - 1.0) < 1e-6 for r in rows)


def test_bruteforce_knn_shape(spark, sf_dir):
    top = vectors.embedding_knn_bruteforce(spark, sf_dir)
    pdf = top.toPandas()
    assert set(pdf["query_id"].unique()) == set(range(vectors.N_QUERIES))
    assert (pdf.groupby("query_id").size() == vectors.K).all()
    # ranks are 1..K and sims non-increasing within each query
    for _, g in pdf.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, vectors.K + 1))
        assert (g["sim"].diff().dropna() <= 1e-9).all()


def test_ivf_finds_planted_neighbors(spark, sf_dir):
    """IVF must recover near-identical planted neighbors: a tiny
    perturbation of a query vector lands in the same coarse cell with
    overwhelming probability, and the exact re-rank ranks it #1."""
    import numpy as np
    from realtime_data_pipeline_spark import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )
    rows = queries.collect()
    planted = [
        (
            100_000 + r.query_id,
            [float(x) + 0.001 * ((i % 3) - 1) for i, x in enumerate(r.query_vec)],
            -1,
        )
        for r in rows
    ]
    corpus = emb.unionByName(
        spark.createDataFrame(
            planted, "vec_id long, embedding array<float>, label int"
        )
    )
    top = sim.ivf_knn(corpus, queries, k=5).toPandas()
    best = top[top["rank"] == 1].set_index("query_id")["vec_id"]
    hits = sum(best.get(q) == 100_000 + q for q in range(5))
    assert hits >= 4, f"planted neighbor missed: {best.to_dict()}"


def test_embedding_neardup_lsh_recall(spark, sf_dir):
    """The LSH self-pairing sweep must recover most above-threshold pairs
    the exact small-N baseline finds within the same id range."""
    exact = {
        (r.id_a, r.id_b)
        for r in vectors.embeddings_cosine_pairs(spark, sf_dir).collect()
    }
    if not exact:  # sf too small to contain above-threshold pairs
        return
    approx_all = {
        (r.id_a, r.id_b)
        for r in vectors.embeddings_neardup_lsh(spark, sf_dir).collect()
    }
    approx = {p for p in approx_all if p[0] < vectors.PAIR_N and p[1] < vectors.PAIR_N}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"lsh pair recall {recall} ({len(exact)} exact pairs)"
    # precision of the verify stage is exact by construction
    assert approx <= exact


def test_trained_ivf_beats_random_quantizer(spark, sf_dir):
    """The k-means-trained coarse quantizer must strictly improve recall@10
    over random centroids at the same nprobe, and clear an absolute floor.
    Everything is seeded/deterministic (sample = lowest ids), so the gate
    is stable: on sf0.001 trained=0.52 vs untrained=0.36."""
    from realtime_data_pipeline_spark import similarity as sim

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (
        corpus.filter(F.col("vec_id") < vectors.N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    exact_sets = (
        vectors.embedding_knn_bruteforce(spark, sf_dir)
        .toPandas()
        .groupby("query_id")["vec_id"]
        .apply(set)
    )

    def mean_recall(df):
        ap = df.toPandas().groupby("query_id")["vec_id"].apply(set)
        return sum(
            len(exact_sets[q] & ap.get(q, set())) / len(exact_sets[q])
            for q in exact_sets.index
        ) / len(exact_sets)

    untrained = mean_recall(
        sim.ivf_knn(corpus, queries, k=vectors.K, n_centroids=16, nprobe=4)
    )
    cents = sim.train_centroids_kmeans(corpus, n_centroids=16)
    trained = mean_recall(
        sim.ivf_knn(
            corpus, queries, k=vectors.K, n_centroids=16, nprobe=4,
            centroids=cents,
        )
    )
    assert trained > untrained, f"trained {trained} <= untrained {untrained}"
    assert trained >= 0.5, f"trained recall@10 {trained} below floor"


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = vectors.embedding_knn_bruteforce(spark, sf_dir).toPandas()
    approx = vectors.embedding_knn_lsh(spark, sf_dir).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.5, f"mean recall {recalls}"


def test_ivf_index_persist_search_matches_inline(spark, sf_dir, tmp_path):
    """A persisted IVF index (cells hive-partitioned on disk) must return
    exactly what the inline ivf_knn returns for the same quantizer, and
    the index scan must carry a cell partition filter — probing IS
    partition pruning."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.train_centroids_kmeans(emb, n_centroids=8)
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )

    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, idx, cents, layout="hive")
    via_index = similarity.ivf_index_search(spark, idx, queries, k=5, nprobe=3)
    inline = similarity.ivf_knn(
        emb, queries, k=5, nprobe=3, centroids=cents,
        n_centroids=8,
    )
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, inline.collect())
    )

    # the probed-cell filter must reach the partitioned scan
    cents2 = similarity.load_ivf_centroids(spark, idx)
    import numpy as np

    assert np.allclose(cents2, cents)
    pruned = spark.read.parquet(f"{idx}/cells").filter(
        F.col("cell").isin([0, 1])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf_line = next(
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )
    assert "cell" in pf_line


def test_ivf_manifest_layout_single_commit_and_parity(spark, sf_dir, tmp_path):
    """The round-17 manifest cell layout: build writes ONE gen directory
    (not one dir per cell), appends add one gen each with append-mode
    pointers, and search results are identical to the hive layout's."""
    import os

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import manifest_layout as ml
    from realtime_data_pipeline_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.train_centroids_kmeans(emb, n_centroids=8)
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    man_idx = str(tmp_path / "ivf_manifest")
    hive_idx = str(tmp_path / "ivf_hive")
    similarity.build_ivf_index(half_a, man_idx, cents)  # manifest default
    similarity.build_ivf_index(half_a, hive_idx, cents, layout="hive")
    gens = sorted(
        e
        for e in os.listdir(f"{man_idx}/cells")
        if e.startswith("gen=")
    )
    assert gens == ["gen=0"]  # one directory commit, not one per cell

    similarity.append_to_ivf_index(half_b, man_idx)
    similarity.append_to_ivf_index(half_b, hive_idx)
    gens = sorted(
        e
        for e in os.listdir(f"{man_idx}/cells")
        if e.startswith("gen=")
    )
    assert gens == ["gen=0", "gen=1"]
    man = ml.read_manifest(f"{man_idx}/cells")
    assert all(set(v) <= {0, 1} for v in man.values())
    assert any(v == [0, 1] for v in man.values())  # append-mode pointers

    got_man = sorted(
        map(
            tuple,
            similarity.ivf_index_search(
                spark, man_idx, queries, k=5, nprobe=3
            ).collect(),
        )
    )
    got_hive = sorted(
        map(
            tuple,
            similarity.ivf_index_search(
                spark, hive_idx, queries, k=5, nprobe=3
            ).collect(),
        )
    )
    assert got_man == got_hive


def test_ivf_index_multi_assign_persists_and_appends(spark, sf_dir, tmp_path):
    """A corpus_assign=2 index stores every vector in exactly its top-2
    cells, searches identically to the inline multi-assign ivf_knn, and
    APPENDS replicate with the stored R (read from {path}/meta), so an
    appended vector is as findable as a built one."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.train_centroids_kmeans(emb, n_centroids=8)
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    idx = str(tmp_path / "ivf2")
    similarity.build_ivf_index(half_a, idx, cents, corpus_assign=2)
    similarity.append_to_ivf_index(half_b, idx)
    cells = spark.read.parquet(f"{idx}/cells")
    per_id = cells.groupBy("vec_id").count().collect()
    assert all(r["count"] == 2 for r in per_id)  # appended rows too
    assert cells.select("vec_id").distinct().count() == emb.count()

    via_index = similarity.ivf_index_search(spark, idx, queries, k=5, nprobe=3)
    inline = similarity.ivf_knn(
        emb, queries, k=5, nprobe=3, centroids=cents, n_centroids=8,
        corpus_assign=2,
    )
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_ivf_index_incremental_append_equals_full_build(spark, sf_dir, tmp_path):
    """Appending the second half of the corpus with the stored quantizer
    must yield an index that searches identically to one built from the
    full corpus at once (same centroids => same cells => same results)."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.train_centroids_kmeans(emb, n_centroids=8)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    queries = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )

    inc = str(tmp_path / "ivf_inc")
    similarity.build_ivf_index(first, inc, cents)
    similarity.append_to_ivf_index(second, inc)

    full = str(tmp_path / "ivf_full")
    similarity.build_ivf_index(emb, full, cents)

    got = similarity.ivf_index_search(spark, inc, queries, k=5, nprobe=3)
    want = similarity.ivf_index_search(spark, full, queries, k=5, nprobe=3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_int8_quantized_cosine_preserves_knn_recall(spark, sf_dir):
    """int8 quantization is the index STORAGE format; quantized cosine is
    a candidate generator whose top-10 must track the exact top-10
    closely (the exact-vector re-rank absorbs the rest). Also checks the
    quantization error bound: dequantized values within scale/2 of the
    original, i.e. cosine error is second-order."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scale, qvec = similarity.quantize_int8(F.col("embedding"))
    q = emb.select(
        "vec_id",
        similarity.as_double_array(F.col("embedding")).alias("vec"),
        scale.alias("s"),
        qvec.alias("qv"),
    ).persist()
    # error bound: |x - s*qx| <= s/2 per dim
    bad = q.select(
        F.array_max(
            F.zip_with(
                "vec",
                F.transform("qv", lambda x: x.cast("double") * F.col("s")),
                lambda a, b: F.abs(a - b),
            )
        ).alias("err"),
        F.col("s"),
    ).filter(F.col("err") > F.col("s") * 0.5 + 1e-12)
    assert bad.count() == 0

    queries = q.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("s").alias("qs"),
        F.col("qv").alias("qqv"),
    )
    pairs = q.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    k = 10

    def topk(sim_col):
        from realtime_data_pipeline_spark.ops import topk_per_group

        t = topk_per_group(
            pairs.select(
                "query_id", "vec_id", sim_col.alias("sim")
            ),
            ["query_id"],
            [F.col("sim").desc(), F.col("vec_id").asc()],
            k=k,
        )
        return {
            (r.query_id, r.vec_id) for r in t.collect()
        }

    exact = topk(similarity.cosine(F.col("vec"), F.col("qvec")))
    quant = topk(
        similarity.quantized_cosine(
            F.col("s"), F.col("qv"), F.col("qs"), F.col("qqv")
        )
    )
    q.unpersist()
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"quantized knn recall {recall}"


@pytest.mark.slow
def test_quantized_ivf_index_recall_and_size(spark, sf_dir, tmp_path):
    """quantize=True IVF index: search recall@10 vs exact brute-force
    stays high, incremental append matches the stored precision, and
    the index directory is materially smaller than the float index."""
    import os

    def du(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter("vec_id % 10 != 0")
    batch = emb.filter("vec_id % 10 = 0")
    cents = similarity.train_centroids_kmeans(emb, 16)

    full_idx = str(tmp_path / "ivf_full")
    q_idx = str(tmp_path / "ivf_q8")
    similarity.build_ivf_index(corpus, full_idx, cents)
    similarity.build_ivf_index(corpus, q_idx, cents, quantize=True)
    similarity.append_to_ivf_index(batch, q_idx)  # schema-sniffed append
    similarity.append_to_ivf_index(batch, full_idx)
    assert spark.read.parquet(f"{q_idx}/cells").count() == emb.count()
    assert "qvec" in spark.read.parquet(f"{q_idx}/cells").columns
    assert du(f"{q_idx}/cells") < 0.6 * du(f"{full_idx}/cells")

    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_knn(emb, queries, k=10).collect()
    }

    def search(idx):
        return {
            (r.query_id, r.vec_id)
            for r in similarity.ivf_index_search(
                spark, idx, queries, k=10, nprobe=12
            ).collect()
        }

    recall_q = len(exact & search(q_idx)) / len(exact)
    recall_f = len(exact & search(full_idx)) / len(exact)
    # recall loss must come from IVF cell truncation, NOT quantization:
    # int8 tracks the float index (measured identical at this fixture),
    # and both clear the absolute floor
    assert recall_q >= recall_f - 0.05, (recall_q, recall_f)
    assert recall_q >= 0.85, f"quantized ivf recall {recall_q}"


def _semdedup_frame(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_semantic_dedup_drops_planted_neardup(spark):
    """A same-orthant near-identical pair loses its larger id; the
    cross-orthant and anti-parallel vectors survive untouched."""
    df = _semdedup_frame(
        spark,
        [
            (1, [1.0, 1.0, 0.0, 0.0]),     # bucket 3 (++)
            (2, [0.9, 1.1, 0.0, 0.0]),     # bucket 3, cos≈0.995 → dropped
            (3, [1.0, -1.0, 0.0, 0.0]),    # bucket 1 (+-)
            (4, [-1.0, -1.0, 0.0, 0.0]),   # bucket 0 (--)
        ],
    )
    got = {
        r.vec_id: (r.bucket, r.is_kept)
        for r in similarity.semantic_dedup(df, threshold=0.9, n_bits=2).collect()
    }
    assert got == {1: (3, True), 2: (3, False), 3: (1, True), 4: (0, True)}


def test_semantic_dedup_dominance_rule_is_declarative(spark):
    """The drop rule is 'ANY similar smaller-id bucket-mate', not
    union-find: in the chain a~b, b~c, a≁c, BOTH b and c drop — c because
    of b, even though b itself dropped. Pins the declarative semantic
    the oracle SQL expresses."""
    import math

    def at(deg):  # unit vector in the ++ orthant plane
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg)), 0.0, 0.0]

    df = _semdedup_frame(spark, [(1, at(10)), (2, at(45)), (3, at(80))])
    # cos(35°)≈0.819 ≥ 0.8 for adjacent pairs; cos(70°)≈0.342 < 0.8
    got = {
        r.vec_id: r.is_kept
        for r in similarity.semantic_dedup(df, threshold=0.8, n_bits=2).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_semantic_dedup_cross_bucket_dups_survive(spark):
    """Recall boundary by design (the SemDeDup trade): near-identical
    vectors straddling an orthant boundary land in different buckets and
    are never compared."""
    df = _semdedup_frame(
        spark,
        [(1, [1.0, 1e-9, 0.0, 0.0]), (2, [1.0, -1e-9, 0.0, 0.0])],
    )
    got = similarity.semantic_dedup(df, threshold=0.5, n_bits=2).collect()
    assert all(r.is_kept for r in got)
    assert len({r.bucket for r in got}) == 2


def test_semantic_dedup_centroid_path_matches_planted(spark):
    """With a trained/supplied quantizer the bucket is the nearest
    centroid: the planted near-dup pair shares a cell and dedups even
    though its orthant bits differ."""
    import numpy as np

    cents = np.array(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]], dtype=float
    )
    df = _semdedup_frame(
        spark,
        [
            (1, [1.0, 0.01, 0.0, 0.0]),
            (2, [1.0, -0.01, 0.0, 0.0]),  # different orthant, same cell
            (3, [0.0, 0.0, 1.0, 0.0]),
        ],
    )
    got = {
        r.vec_id: r.is_kept
        for r in similarity.semantic_dedup(
            df, threshold=0.9, centroids=cents
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True}


def test_semantic_dedup_is_partitioning_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = sorted(
        (r.vec_id, r.bucket, r.is_kept)
        for r in similarity.semantic_dedup(emb, threshold=0.35).collect()
    )
    resharded = sorted(
        (r.vec_id, r.bucket, r.is_kept)
        for r in similarity.semantic_dedup(
            emb.repartition(7), threshold=0.35
        ).collect()
    )
    assert base == resharded
    assert any(not kept for _, _, kept in base)  # non-trivial at every SF


def test_semantic_dedup_plan_is_bucketed_not_cartesian(spark, sf_dir):
    """The within-bucket self-join must plan as an equi-join on the
    bucket key — never an unbucketed cross product."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = similarity.semantic_dedup(
        emb, threshold=0.35
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_zero_vector_is_never_dropped(spark):
    """An all-zero embedding (real-corpus hazard) must not crash the
    ANSI-mode cosine with divide-by-zero NOR be treated as similar to
    anything: the floored norm gives it cosine 0 everywhere."""
    df = _semdedup_frame(
        spark,
        [
            (1, [1.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # same bucket as id 1 (0 >= 0)
            (3, [0.0, 0.0, 0.0, 0.0]),  # two zero vectors: cos = 0, both kept
        ],
    )
    got = {
        r.vec_id: r.is_kept
        for r in similarity.semantic_dedup(df, threshold=0.1, n_bits=2).collect()
    }
    assert got == {1: True, 2: True, 3: True}


@pytest.mark.slow
def test_incremental_semantic_dedup_probes_index_and_replays(spark, tmp_path):
    """Daily-ingest shape: batch 1 seeds the kept-vector index (after
    in-batch dominance dedup); batch 2's near-copy of an indexed vector
    is a corpus dup, its novel vector is fresh; replaying batch 2 finds
    every survivor in the index at cosine 1.0 and appends nothing."""
    idx = str(tmp_path / "semdedup_idx")

    b1 = _semdedup_frame(
        spark,
        [
            (1, [1.0, 1.0, 0.0, 0.0]),
            (2, [0.99, 1.01, 0.0, 0.0]),  # in-batch dup of id 1
            (3, [1.0, 0.0, 0.0, 0.0]),    # cos with id 1 ≈ 0.707 < 0.9
        ],
    )
    fresh1, m1 = similarity.incremental_semantic_dedup(
        b1, idx, threshold=0.9, n_bits=2
    )
    assert m1 == {
        "batch_rows": 3, "in_batch_dropped": 1,
        "corpus_dups": 0, "fresh_rows": 2,
    }
    assert {r.vec_id for r in fresh1.collect()} == {1, 3}
    assert spark.read.parquet(idx).count() == 2

    b2 = _semdedup_frame(
        spark,
        [
            (10, [1.01, 0.99, 0.0, 0.0]),  # corpus dup of indexed id 1
            (11, [0.0, 1.0, 0.0, 0.0]),    # novel direction -> fresh
        ],
    )
    fresh2, m2 = similarity.incremental_semantic_dedup(
        b2, idx, threshold=0.9, n_bits=2
    )
    assert m2 == {
        "batch_rows": 2, "in_batch_dropped": 0,
        "corpus_dups": 1, "fresh_rows": 1,
    }
    assert {r.vec_id for r in fresh2.collect()} == {11}
    assert spark.read.parquet(idx).count() == 3

    fresh2r, m2r = similarity.incremental_semantic_dedup(
        b2, idx, threshold=0.9, n_bits=2
    )
    assert m2r["fresh_rows"] == 0 and m2r["corpus_dups"] == 2
    assert fresh2r.count() == 0
    assert spark.read.parquet(idx).count() == 3  # replay appended nothing


def test_incremental_semantic_dedup_greedy_kept_chain(spark, tmp_path):
    """Cross-batch chains use greedy-KEPT semantics: a vector dropped in
    an earlier batch never dominates a later one — unlike the one-shot
    dominance rule, which would drop the chain tail too (both semantics
    documented; this pins the divergence)."""
    import math

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg)), 0.0, 0.0]

    idx = str(tmp_path / "chain_idx")
    # batch 1: a(10°) keeps, b(45°) drops (cos 35° ≈ 0.819 ≥ 0.8)
    _, m1 = similarity.incremental_semantic_dedup(
        _semdedup_frame(spark, [(1, at(10)), (2, at(45))]),
        idx, threshold=0.8, n_bits=2,
    )
    assert m1["fresh_rows"] == 1 and m1["in_batch_dropped"] == 1
    # batch 2: c(80°) is similar only to the DROPPED b — b is not in the
    # index, so c survives (one-shot dominance on the union would drop it)
    fresh2, m2 = similarity.incremental_semantic_dedup(
        _semdedup_frame(spark, [(3, at(80))]), idx, threshold=0.8, n_bits=2
    )
    assert m2 == {
        "batch_rows": 1, "in_batch_dropped": 0,
        "corpus_dups": 0, "fresh_rows": 1,
    }
    assert {r.vec_id for r in fresh2.collect()} == {3}
    one_shot = similarity.semantic_dedup(
        _semdedup_frame(spark, [(1, at(10)), (2, at(45)), (3, at(80))]),
        threshold=0.8, n_bits=2,
    )
    assert {r.vec_id: r.is_kept for r in one_shot.collect()}[3] is False


def test_orthant_bucket_short_vectors_degrade_gracefully(spark):
    """ADVICE r7: under ANSI mode, element_at past the array end fails the
    whole job. try_element_at degrades instead: missing dims (and null
    elements) map to bit 0, so short vectors coarsen into fewer effective
    buckets rather than erroring — and an empty array lands in bucket 0."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 1.0, 1.0, 1.0]),   # full 4 dims -> bucket 0b1111
            (2, [1.0, 1.0]),             # 2 dims -> bits 2,3 default 0
            (3, []),                     # empty -> bucket 0
            (4, [-1.0, None, 1.0, 1.0]), # null element -> bit 0
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id",
            similarity.orthant_bucket(F.col("embedding"), n_bits=4).alias("b"),
        ).collect()
    }
    assert got == {1: 0b1111, 2: 0b0011, 3: 0, 4: 0b1100}


def test_incremental_semantic_dedup_refuses_concurrent_writer(spark, tmp_path):
    """ADVICE r7: two concurrent ingests against the same index could both
    pass the probe before either appends, writing mutual near-dups as
    fresh. The probe+append span now holds medallion's merge lock — a
    second writer fails loudly instead of racing."""
    import pytest

    from realtime_data_pipeline_spark import medallion

    idx = str(tmp_path / "locked_idx")
    b1 = _semdedup_frame(spark, [(1, [1.0, 1.0, 0.0, 0.0])])
    with medallion._merge_lock(idx, op="semantic-dedup-ingest"):
        with pytest.raises(medallion.ConcurrentMergeError, match="in flight"):
            similarity.incremental_semantic_dedup(
                b1, idx, threshold=0.9, n_bits=2
            )
    # lock released -> the ingest lands and never leaks its own lock
    import os

    _, m = similarity.incremental_semantic_dedup(
        b1, idx, threshold=0.9, n_bits=2
    )
    assert m["fresh_rows"] == 1
    assert not os.path.exists(idx + "._merge_lock")


def test_pq_encode_is_deterministic_and_m_wide(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=32)
    assert books.shape[0] == 8 and books.shape[1] == 32
    a = {
        r.vec_id: tuple(r.pq_code)
        for r in similarity.pq_encode(emb, books).collect()
    }
    b = {
        r.vec_id: tuple(r.pq_code)
        for r in similarity.pq_encode(emb, books).collect()
    }
    assert a == b
    assert all(len(c) == 8 for c in a.values())
    assert all(0 <= v < 32 for c in a.values() for v in c)


def test_pq_knn_recall_vs_bruteforce(spark, sf_dir):
    """ADC over m-byte codes must stay close to the exact scan: recall@10
    against brute force, plus basic shape/determinism checks. The gate is
    deliberately below measured (trained codebooks, 64-dim, m=8/256 codes
    measure well above it) but far above chance (10/corpus ≈ 1%)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_knn(emb, queries, k=10).collect()
    }
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=256)
    got_rows = similarity.pq_knn(emb, queries, k=10, codebooks=books).collect()
    got = {(r.query_id, r.vec_id) for r in got_rows}
    # shape: exactly 10 ranked rows per query, no self-matches
    import collections

    per_q = collections.Counter(r.query_id for r in got_rows)
    assert set(per_q) == set(range(8)) and all(v == 10 for v in per_q.values())
    assert all(r.query_id != r.vec_id for r in got_rows)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"PQ recall@10 {recall:.3f} below gate"
    # pre-encoded codes path gives the identical result
    codes = similarity.pq_encode(emb, books)
    again = {
        (r.query_id, r.vec_id)
        for r in similarity.pq_knn(
            emb, queries, k=10, codebooks=books, codes=codes
        ).collect()
    }
    assert again == got


def test_ivf_pq_knn_recall_and_probe_pruning(spark, sf_dir):
    """IVF×PQ composition: recall@10 within quantization+probe bounds of
    exact, and probing MORE cells never lowers it (probe-coverage
    monotonicity on the same codebooks)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_knn(emb, queries, k=10).collect()
    }
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=256)
    cents = similarity.train_centroids_kmeans(emb, n_centroids=16)

    def recall(nprobe):
        got = {
            (r.query_id, r.vec_id)
            for r in similarity.ivf_pq_knn(
                emb, queries, k=10, codebooks=books, centroids=cents,
                nprobe=nprobe,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r4, r16 = recall(4), recall(16)
    assert r16 >= r4 - 1e-9, (r4, r16)
    # full probe == plain PQ recall (coarse stage adds no loss at 100%)
    pq_full = {
        (r.query_id, r.vec_id)
        for r in similarity.pq_knn(
            emb, queries, k=10, codebooks=books
        ).collect()
    }
    full = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_pq_knn(
            emb, queries, k=10, codebooks=books, centroids=cents, nprobe=16,
        ).collect()
    }
    assert full == pq_full
    assert r4 >= 0.3, f"IVF-PQ recall@10 {r4:.3f} below gate at nprobe=4/16"


@pytest.mark.slow
def test_ivf_pq_index_search_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    """The persisted IVF×PQ index (cell-partitioned CODE files) must
    search identically to the inline ivf_pq_knn — both delegate to one
    ranking core — across bare ADC, exact-refine, and multi-assignment;
    probing must prune partitions on the code files; refine without a
    vectors source is refused (code files carry no vectors)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=64)
    cents = similarity.train_centroids_kmeans(emb, n_centroids=8)
    idx = str(tmp_path / "ivfpq")
    similarity.build_ivf_pq_index(
        emb, idx, cents, books, corpus_assign=2
    )
    # codebooks round-trip exactly
    import numpy as np

    assert np.allclose(similarity.load_pq_codebooks(spark, idx), books)

    for kwargs in (
        {},  # bare ADC
        {"refine_k": 60, "refine_with": emb},  # exact refine
    ):
        inline_kwargs = dict(kwargs)
        inline_kwargs.pop("refine_with", None)
        via_index = similarity.ivf_pq_index_search(
            spark, idx, queries, k=5, nprobe=3, **kwargs
        )
        inline = similarity.ivf_pq_knn(
            emb, queries, k=5, codebooks=books, centroids=cents,
            nprobe=3, corpus_assign=2, **inline_kwargs,
        )
        assert sorted(map(tuple, via_index.collect())) == sorted(
            map(tuple, inline.collect())
        ), kwargs

    with _pytest.raises(ValueError, match="refine_k needs"):
        similarity.ivf_pq_index_search(
            spark, idx, queries, k=5, nprobe=3, refine_k=60
        ).collect()

    # the probed-cell filter is partition pruning on the code files
    pruned = spark.read.parquet(f"{idx}/cells").filter(
        F.col("cell").isin([0, 1])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_pq_and_ivf_pq_accept_string_ids(spark, sf_dir):
    """The ADC output schema follows the INPUT id types (same generality
    contract as bfs_hops): string doc ids search identically to the
    bigint originals, inline and through the refine path."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    s_emb = emb.select(
        F.concat(F.lit("doc-"), F.format_string("%06d", "vec_id")).alias(
            "vec_id"
        ),
        "embedding",
    )
    queries = s_emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    books = similarity.train_pq_codebooks(
        s_emb, m=8, n_codes=32, id_col="vec_id"
    )
    got = similarity.pq_knn(
        s_emb, queries, k=5, codebooks=books, refine_k=40
    ).collect()
    assert len(got) == 25
    assert all(isinstance(r.vec_id, str) and isinstance(r.query_id, str)
               for r in got)
    # zero-padded string ids sort like the numeric originals, so the
    # result must be the bigint run's rows under the same rename
    num_books = similarity.train_pq_codebooks(emb, m=8, n_codes=32)
    num_q = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    num = similarity.pq_knn(
        emb, num_q, k=5, codebooks=num_books, refine_k=40
    ).collect()
    fmt = "doc-{:06d}".format
    assert sorted((r.query_id, r.vec_id, r.sim) for r in got) == sorted(
        (fmt(r.query_id), fmt(r.vec_id), r.sim) for r in num
    )
    cents = similarity.train_centroids_kmeans(s_emb, n_centroids=8)
    ivf = similarity.ivf_pq_knn(
        s_emb, queries, k=5, codebooks=books, centroids=cents, nprobe=8,
    ).collect()
    assert len(ivf) > 0 and all(isinstance(r.vec_id, str) for r in ivf)


def test_pq_refine_full_candidates_equals_brute_force(spark, sf_dir):
    """The exact-refine identity: refine_k covering the whole corpus means
    the ADC stage only ORDERS candidates and the exact pass decides — the
    result must equal brute_force_knn row-for-row (same scoring spelling,
    same round-6 tiebreak), proving the refine pass is exact."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = sorted(
        (r.query_id, r.vec_id, r.sim, r.rank)
        for r in similarity.brute_force_knn(emb, queries, k=10).collect()
    )
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=64)
    n = emb.count()
    got = sorted(
        (r.query_id, r.vec_id, r.sim, r.rank)
        for r in similarity.pq_knn(
            emb, queries, k=10, codebooks=books, refine_k=n
        ).collect()
    )
    assert got == exact


def test_refine_lifts_pq_and_ivf_pq_recall(spark, sf_dir):
    """refine_k at a practical width (10×k) must not lower recall vs the
    bare ADC ranking, and IVF×PQ at nprobe=4 with refine must clear the
    recommended-default gate the bare composition misses."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_knn(emb, queries, k=10).collect()
    }
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=256)
    cents = similarity.train_centroids_kmeans(emb, n_centroids=16)

    def rec(df):
        got = {(r.query_id, r.vec_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    pq_bare = rec(similarity.pq_knn(emb, queries, k=10, codebooks=books))
    pq_ref = rec(
        similarity.pq_knn(emb, queries, k=10, codebooks=books, refine_k=100)
    )
    assert pq_ref >= pq_bare - 1e-9, (pq_bare, pq_ref)
    assert pq_ref >= 0.9, f"PQ+refine recall@10 {pq_ref:.3f} below gate"
    ivf_ref = rec(
        similarity.ivf_pq_knn(
            emb, queries, k=10, codebooks=books, centroids=cents,
            nprobe=4, refine_k=100,
        )
    )
    ivf_bare = rec(
        similarity.ivf_pq_knn(
            emb, queries, k=10, codebooks=books, centroids=cents, nprobe=4,
        )
    )
    assert ivf_ref >= ivf_bare - 1e-9, (ivf_bare, ivf_ref)


def test_ivf_multi_assignment_lifts_probe_bound(spark, sf_dir):
    """SPANN-style corpus_assign=2: each corpus vector lives in its top-2
    cells, so at the SAME nprobe the probe-coverage bound can only rise
    (the probed set is a superset of the single-assignment one). Shape
    contract survives the duplication: still k unique ids per query."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_knn(emb, queries, k=10).collect()
    }
    cents = similarity.train_centroids_kmeans(emb, n_centroids=16)
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=64)

    def rec_and_rows(df):
        rows = df.collect()
        got = {(r.query_id, r.vec_id) for r in rows}
        return len(got & exact) / len(exact), rows

    r1, _ = rec_and_rows(
        similarity.ivf_knn(emb, queries, k=10, nprobe=4, centroids=cents)
    )
    r2, _ = rec_and_rows(
        similarity.ivf_knn(
            emb, queries, k=10, nprobe=4, centroids=cents, corpus_assign=2
        )
    )
    assert r2 >= r1 - 1e-9, (r1, r2)
    pq1, _ = rec_and_rows(
        similarity.ivf_pq_knn(
            emb, queries, k=10, codebooks=books, centroids=cents, nprobe=4,
            refine_k=60,
        )
    )
    pq2, rows = rec_and_rows(
        similarity.ivf_pq_knn(
            emb, queries, k=10, codebooks=books, centroids=cents, nprobe=4,
            refine_k=60, corpus_assign=2,
        )
    )
    assert pq2 >= pq1 - 1e-9, (pq1, pq2)
    # no duplicate (query, id) pairs despite the 2x replication
    pairs = [(r.query_id, r.vec_id) for r in rows]
    assert len(pairs) == len(set(pairs))
    import collections

    per_q = collections.Counter(r.query_id for r in rows)
    assert all(v == 10 for v in per_q.values())
