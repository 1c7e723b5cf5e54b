"""Dimensionality reduction (reduction.py): one-pass moments vs numpy,
layout invariance, PCA model properties, expr/arrow projection parity,
whitening, seeded JL determinism + distance preservation, and the
PCA-as-candidate-generator recall story for ANN."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import reduction


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def test_moments_match_numpy_exactly(emb, X):
    n, mean, cov = reduction.moments(emb)
    assert n == X.shape[0]
    np.testing.assert_allclose(mean, X.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(X, rowvar=False), atol=1e-10)


def test_moments_invariant_to_partition_layout(emb):
    base = reduction.moments(emb.coalesce(1))
    wide = reduction.moments(emb.repartition(13))
    assert base[0] == wide[0]
    np.testing.assert_allclose(base[1], wide[1], atol=1e-9)
    np.testing.assert_allclose(base[2], wide[2], atol=1e-9)


def test_moments_skip_null_and_ragged_vectors(spark, emb):
    import pandas as pd

    d = len(emb.select("embedding").first().embedding)
    junk = spark.createDataFrame(
        pd.DataFrame({"embedding": [None, [1.0, 2.0]]}),
        f"embedding array<double>",
    )
    n_clean, mean_clean, cov_clean = reduction.moments(emb)
    n_mixed, mean_mixed, cov_mixed = reduction.moments(
        emb.select("embedding").unionByName(junk), dim=d
    )
    assert n_mixed == n_clean
    np.testing.assert_allclose(mean_mixed, mean_clean, atol=1e-9)
    np.testing.assert_allclose(cov_mixed, cov_clean, atol=1e-9)


def test_moments_requires_two_rows(emb):
    with pytest.raises(ValueError, match=">= 2 valid vectors"):
        reduction.moments(emb.limit(1))


def test_pca_model_properties(emb, X):
    k = 8
    model = reduction.pca_train(emb, k=k)
    # eigenvalue-descending, nonnegative, explained fraction in (0, 1]
    ev = model["eigvals"]
    assert np.all(ev[:-1] >= ev[1:] - 1e-12) and ev[-1] >= -1e-10
    assert 0 < model["explained"] <= 1 + 1e-12
    # orthonormal rows
    G = model["components"] @ model["components"].T
    np.testing.assert_allclose(G, np.eye(k), atol=1e-9)
    # sign convention: the largest-|.| coordinate of each row is positive
    for row in model["components"]:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # parity with numpy eigh on the numpy covariance
    vals, vecs = np.linalg.eigh(np.cov(X, rowvar=False))
    np.testing.assert_allclose(ev, vals[::-1][:k], atol=1e-9)


def test_projection_expr_arrow_numpy_parity(emb, X):
    model = reduction.pca_train(emb, k=6)
    Y = (X - model["mean"]) @ model["components"].T

    def as_mat(df):
        rows = df.select("vec_id", "pca").collect()
        rows.sort(key=lambda r: r.vec_id)
        return np.array([r.pca for r in rows])

    for method in ("expr", "arrow"):
        got = as_mat(reduction.pca_project(emb, model, method=method))
        np.testing.assert_allclose(got, Y, atol=1e-9, err_msg=method)


def test_expr_projection_stays_jvm_side(emb):
    model = reduction.pca_train(emb, k=4)
    plan = plan_str(reduction.pca_project(emb, model, method="expr"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: projection never shuffles


def test_projection_nulls_pass_through_not_dropped(spark, emb):
    import pandas as pd

    d = len(emb.select("embedding").first().embedding)
    junk = spark.createDataFrame(
        pd.DataFrame({"embedding": [None, [1.0] * (d - 1)]}),
        "embedding array<double>",
    )
    mixed = emb.select("embedding").unionByName(junk)
    mat = np.eye(2, d)
    for method in ("expr", "arrow"):
        out = reduction.project(mixed, mat, method=method)
        assert out.count() == mixed.count(), method
        assert out.filter(F.col("proj").isNull()).count() == 2, method


def test_whitened_covariance_is_identity(emb):
    k = 6
    model = reduction.pca_train(emb, k=k)
    w = reduction.pca_project(emb, model, whiten=True, method="arrow")
    W = np.stack([np.asarray(r.pca) for r in w.select("pca").collect()])
    np.testing.assert_allclose(np.cov(W, rowvar=False), np.eye(k), atol=1e-6)


def test_jl_deterministic_and_distance_preserving(emb, X):
    d = X.shape[1]
    # same seed -> bit-identical matrix; different seed -> different
    assert np.array_equal(reduction.jl_matrix(16, d, 3), reduction.jl_matrix(16, d, 3))
    assert not np.array_equal(reduction.jl_matrix(16, d, 3), reduction.jl_matrix(16, d, 4))

    out = reduction.random_projection(emb, 32, seed=11, method="arrow")
    rows = out.select("vec_id", "rp").collect()
    rows.sort(key=lambda r: r.vec_id)
    Y = np.array([r.rp for r in rows])
    # JL: squared distances preserved in expectation; check the mean
    # relative distortion over a deterministic pair sample
    m = min(120, X.shape[0])
    dx = ((X[:m, None, :] - X[None, :m, :]) ** 2).sum(-1)
    dy = ((Y[:m, None, :] - Y[None, :m, :]) ** 2).sum(-1)
    iu = np.triu_indices(m, 1)
    ratio = dy[iu] / dx[iu]
    assert abs(float(np.mean(ratio)) - 1.0) < 0.15
    assert float(np.mean(np.abs(ratio - 1.0))) < 0.35


def _exact_top10(X, q_idx):
    sims = (X @ X[q_idx].T).T  # cosine ordering == dot if not normalized?
    # use true cosine: normalize
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn[q_idx] @ Xn.T
    out = {}
    for qi, row in zip(q_idx, sims):
        order = np.argsort(-row)
        out[qi] = [int(i) for i in order if i != qi][:10]
    return out


def test_pca_candidate_generation_recall(emb, X):
    """PCA space as an ANN candidate generator: top-50 candidates in the
    reduced space, exact re-rank in full space — recall@10 must beat the
    raw reduced-space top-10 and clear a floor. The fixture is
    near-isotropic (top-8 components carry ~20% of variance), so the
    raw reduced-space recall is structurally modest — the measured
    numbers document the knob, the refine step recovers the loss."""
    # measured (this fixture family): sf0.001 k=24/cand=100 reads
    # raw 0.38 -> refined 0.93; sf0.1 (2000 vecs, explained 0.45)
    # reads raw 0.245 -> refined 0.76. Gate below both with margin.
    model = reduction.pca_train(emb, k=24)
    proj = reduction.pca_project(emb, model, method="arrow")
    rows = proj.select("vec_id", "pca").collect()
    rows.sort(key=lambda r: r.vec_id)
    P = np.array([r.pca for r in rows])
    Pn = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    q_idx = list(range(20))
    exact = _exact_top10(X, q_idx)
    hit_raw = hit_refined = 0
    for qi in q_idx:
        red = Pn[qi] @ Pn.T
        order = [int(i) for i in np.argsort(-red) if i != qi]
        raw10 = order[:10]
        cand = order[:100]
        rerank = sorted(cand, key=lambda i: -(Xn[qi] @ Xn[i]))[:10]
        hit_raw += len(set(raw10) & set(exact[qi]))
        hit_refined += len(set(rerank) & set(exact[qi]))
    recall_raw = hit_raw / (10 * len(q_idx))
    recall_refined = hit_refined / (10 * len(q_idx))
    # refine must recover what the reduced space loses
    assert recall_refined >= recall_raw
    assert recall_refined >= 0.65, (recall_raw, recall_refined)


def test_covariance_face_matches_moments(spark, sf_dir, emb):
    from realtime_data_pipeline_spark.queries.vectors import (
        embeddings_covariance,
    )

    _n, _mean, cov = reduction.moments(emb)
    got = {
        (r.i, r.j): r.cov
        for r in embeddings_covariance(spark, sf_dir).collect()
    }
    d = cov.shape[0]
    assert len(got) == d * d
    for (i, j), v in got.items():
        assert abs(v - round(float(cov[i, j]), 6)) < 1e-12


def test_incremental_moments_equal_full_recompute(spark, emb, tmp_path):
    """Three arrival slices folded through the persisted sketch must
    equal the one-shot pass — the additive-totals merge across TIME is
    the same merge the distributed pass does across partitions."""
    path = str(tmp_path / "mom")
    slices = [
        emb.filter(F.col("vec_id") % 3 == i).select("embedding")
        for i in range(3)
    ]
    d = len(emb.select("embedding").first().embedding)
    for i, sl in enumerate(slices):
        n, mean, cov = reduction.incremental_moments(
            spark, sl, path, dim=d, batch_id=i
        )
    full = reduction.moments(emb)
    assert n == full[0]
    np.testing.assert_allclose(mean, full[1], atol=1e-9)
    np.testing.assert_allclose(cov, full[2], atol=1e-9)
    # and the persisted state reloads to the same stats
    again = reduction.moments_from_path(spark, path)
    assert again[0] == full[0]
    np.testing.assert_allclose(again[2], full[2], atol=1e-9)


def test_incremental_moments_replay_is_idempotent(spark, emb, tmp_path):
    """A replayed micro-batch (same epoch id) must NOT double-count —
    the restarted-stream contract."""
    path = str(tmp_path / "mom_replay")
    d = len(emb.select("embedding").first().embedding)
    sink = reduction.moments_sink(spark, path, dim=d)
    half = emb.filter(F.col("vec_id") % 2 == 0).select("embedding")
    sink(half, 0)
    n1, _, cov1 = reduction.moments_from_path(spark, path)
    sink(half, 0)  # replay of epoch 0
    n2, _, cov2 = reduction.moments_from_path(spark, path)
    assert n1 == n2
    np.testing.assert_allclose(cov1, cov2, atol=0)
    sink(emb.filter(F.col("vec_id") % 2 == 1).select("embedding"), 1)
    n3, _, _ = reduction.moments_from_path(spark, path)
    assert n3 == emb.count()


def test_pca_from_persisted_sketch_no_data_scan(spark, emb, tmp_path):
    path = str(tmp_path / "mom_pca")
    d = len(emb.select("embedding").first().embedding)
    reduction.incremental_moments(
        spark, emb.select("embedding"), path, dim=d
    )
    from_sketch = reduction.pca_train_from_path(spark, path, k=5)
    direct = reduction.pca_train(emb, k=5)
    np.testing.assert_allclose(
        from_sketch["components"], direct["components"], atol=1e-9
    )
    np.testing.assert_allclose(
        from_sketch["eigvals"], direct["eigvals"], atol=1e-9
    )


def test_pca_model_roundtrip_exact(spark, emb, tmp_path):
    model = reduction.pca_train(emb, k=4)
    path = str(tmp_path / "pca_model")
    reduction.save_pca_model(spark, model, path)
    back = reduction.load_pca_model(spark, path)
    assert np.array_equal(back["components"], model["components"])
    assert np.array_equal(back["mean"], model["mean"])
    assert np.array_equal(back["eigvals"], model["eigvals"])
    assert back["n"] == model["n"]


def test_pca_knn_operator_matches_exact_at_full_k(spark, emb, X):
    """With pca_k == d (lossless rotation) the candidate space is exact,
    so pca_knn must equal brute_force_knn row-for-row."""
    from realtime_data_pipeline_spark import similarity

    d = X.shape[1]
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    got = reduction.pca_knn(emb, queries, k=10, cand=50, pca_k=d)
    exact = similarity.brute_force_knn(emb, queries, k=10)
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, exact.collect()))
    assert g == e


def test_pca_knn_reduced_recall_floor(spark, emb, X):
    from realtime_data_pipeline_spark import similarity

    queries = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    got = reduction.pca_knn(emb, queries, k=10, cand=100, pca_k=24)
    exact = similarity.brute_force_knn(emb, queries, k=10)
    g = {}
    for r in got.collect():
        g.setdefault(r.query_id, set()).add(r.vec_id)
    hits = total = 0
    for r in exact.collect():
        total += 1
        if r.vec_id in g.get(r.query_id, set()):
            hits += 1
    assert hits / total >= 0.6, hits / total  # measured 0.72-0.93 range


def test_warm_start_continual_training(spark, emb):
    """classifier warm-start: folding a second batch into yesterday's
    weights must equal training the reference GD with the same init."""
    import pandas as pd

    from realtime_data_pipeline_spark import classifier

    dim = 64
    rows_a = [(f"good text alpha {i}", 1) for i in range(30)] + [
        (f"junk blob beta {i}", 0) for i in range(30)
    ]
    rows_b = [(f"good prose gamma {i}", 1) for i in range(20)] + [
        (f"junk noise delta {i}", 0) for i in range(20)
    ]

    def mk(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["text", "y"])
        ).withColumn("x", classifier.hash_features(F.col("text"), dim))

    a, b = mk(rows_a), mk(rows_b)
    m1 = classifier.logreg_train(a, "x", "y", dim=dim, iters=5)
    m2 = classifier.logreg_train(b, "x", "y", dim=dim, iters=5, init=m1)
    rows = b.select("x", "y").collect()
    w_ref = np.asarray(m1["w"]).copy()
    b_ref = m1["bias"]
    bags = [list(r.x) for r in rows]
    ys = [float(r.y) for r in rows]
    n = len(bags)
    for _ in range(5):
        g = np.zeros(dim + 1)
        for idx, y in zip(bags, ys):
            ii = np.asarray(idx, dtype=np.int64)
            z = b_ref + w_ref[ii].sum()
            r_ = 1.0 / (1.0 + np.exp(-z)) - y
            np.add.at(g, ii, r_)
            g[dim] += r_
        w_ref -= 0.5 * (g[:dim] / n + 1e-4 * w_ref)
        b_ref -= 0.5 * (g[dim] / n)
    np.testing.assert_allclose(m2["w"], w_ref, atol=1e-9)
    assert abs(m2["bias"] - b_ref) < 1e-9
    # dim mismatch refuses loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim mismatch"):
        classifier.logreg_train(b, "x", "y", dim=32, iters=1, init=m1)


def test_mahalanobis_matches_numpy_inverse_covariance(spark, emb, X):
    """maha² via full-rank whitening must equal (x-μ)ᵀ Σ⁻¹ (x-μ)."""
    scored = reduction.mahalanobis_score(emb)
    rows = scored.select("vec_id", "maha2").collect()
    rows.sort(key=lambda r: r.vec_id)
    got = np.array([r.maha2 for r in rows])
    mu = X.mean(axis=0)
    Sinv = np.linalg.inv(np.cov(X, rowvar=False))
    ref = np.einsum("ij,jk,ik->i", X - mu, Sinv, X - mu)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    # chi2(d) shape sanity: mean ~ d on the fixture
    d = X.shape[1]
    assert abs(got.mean() - d) < 0.35 * d


def test_mahalanobis_outlier_gate_flags_planted_anomaly(spark, emb):
    """A vector far outside the data ellipsoid must clear the
    d + 3·sqrt(2d) gate while typical rows mostly stay under it."""
    import pandas as pd

    d = len(emb.select("embedding").first().embedding)
    model = reduction.pca_train(emb, k=d)
    spike = [50.0] * d
    planted = spark.createDataFrame(
        pd.DataFrame({"vec_id": [999999], "embedding": [spike]}),
        "vec_id long, embedding array<double>",
    )
    scored = reduction.mahalanobis_score(
        emb.select("vec_id", "embedding").unionByName(planted), model=model
    )
    gate = d + 3 * (2 * d) ** 0.5
    flagged = {r.vec_id for r in scored.filter(F.col("maha2") > gate).collect()}
    assert 999999 in flagged
    assert len(flagged) <= 1 + int(0.05 * emb.count())


def test_grouped_covariance_matches_per_label_numpy(spark, emb):
    """Per-label covariance via the distributed long-format totals must
    equal numpy per label; a singleton group is dropped."""
    import pandas as pd

    got = reduction.grouped_covariance(
        emb.withColumn("g", F.col("label").cast("string")), "g"
    )
    rows = got.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.group, {})[(r.i, r.j)] = r.cov
    data = emb.select("label", "embedding").collect()
    X_by = {}
    for r in data:
        X_by.setdefault(str(r.label), []).append(
            np.asarray(r.embedding, dtype=np.float64)
        )
    assert set(by_label) == {k for k, v in X_by.items() if len(v) >= 2}
    for lbl, vecs in X_by.items():
        if len(vecs) < 2:
            continue
        ref = np.cov(np.stack(vecs), rowvar=False)
        d = ref.shape[0]
        for i in range(d):
            for j in range(d):
                assert abs(by_label[lbl][(i, j)] - ref[i, j]) < 1e-9

    # singleton group dropped
    d = len(emb.select("embedding").first().embedding)
    single = spark.createDataFrame(
        pd.DataFrame({"g": ["only"], "embedding": [[1.0] * d]}),
        "g string, embedding array<double>",
    )
    out = reduction.grouped_covariance(
        emb.withColumn("g", F.col("label").cast("string"))
        .select("g", "embedding")
        .unionByName(single),
        "g",
        dim=d,
    )
    assert out.filter(F.col("group") == "only").count() == 0


def test_grouped_moments_layout_invariant(emb):
    a = reduction.grouped_moments(
        emb.coalesce(1).withColumn("g", F.col("label").cast("string")), "g"
    )
    b = reduction.grouped_moments(
        emb.repartition(13).withColumn("g", F.col("label").cast("string")),
        "g",
    )
    av = {(r.group, r.pos): r.val for r in a.collect()}
    bv = {(r.group, r.pos): r.val for r in b.collect()}
    assert set(av) == set(bv)
    for k in av:
        assert abs(av[k] - bv[k]) <= 1e-9 * max(1.0, abs(av[k]))


def _fisher_ratio(Y, labels):
    """between-centroid spread over mean within-class spread."""
    import collections

    groups = collections.defaultdict(list)
    for y, l in zip(Y, labels):
        groups[l].append(y)
    mu = Y.mean(axis=0)
    between = sum(
        len(v) * float(np.sum((np.mean(v, axis=0) - mu) ** 2))
        for v in groups.values()
    )
    within = sum(
        float(np.sum((np.asarray(v) - np.mean(v, axis=0)) ** 2))
        for v in groups.values()
    )
    return between / within


def test_lda_beats_pca_on_class_separation(spark, emb, X):
    """Fisher criterion in LDA space must exceed the same-k PCA space —
    the point of supervision; and the spelling must match a direct
    numpy solve of the same shrunk generalized eigenproblem."""
    labeled = emb.withColumn("g", F.col("label").cast("string"))
    k = 4
    lda = reduction.lda_train(labeled, "g", k=k)
    pca = reduction.pca_train(emb, k=k)
    rows = emb.select("vec_id", "label").collect()
    rows.sort(key=lambda r: r.vec_id)
    labels = [r.label for r in rows]
    Yl = (X - lda["mean"]) @ lda["components"].T
    Yp = (X - pca["mean"]) @ pca["components"].T
    assert _fisher_ratio(Yl, labels) > _fisher_ratio(Yp, labels)
    # numpy reference for the whole solve
    import collections

    groups = collections.defaultdict(list)
    for x, l in zip(X, labels):
        groups[l].append(x)
    d = X.shape[1]
    n_tot = len(X)
    stats = {
        g: (len(v), np.mean(v, axis=0), np.cov(np.stack(v), rowvar=False))
        for g, v in groups.items()
    }
    mu = sum(n * m for n, m, _ in stats.values()) / n_tot
    Sw = sum((n - 1) * c for n, _, c in stats.values()) / (
        n_tot - len(stats)
    )
    Sb = sum(n * np.outer(m - mu, m - mu) for n, m, _ in stats.values()) / n_tot
    Sw = Sw + 1e-6 * (np.trace(Sw) / d) * np.eye(d)
    wv, wV = np.linalg.eigh(Sw)
    isq = wV @ np.diag(1.0 / np.sqrt(np.maximum(wv, 1e-12))) @ wV.T
    M = isq @ Sb @ isq
    vals, vecs = np.linalg.eigh((M + M.T) / 2)
    order = np.argsort(vals)[::-1][:k]
    ref = (isq @ vecs[:, order]).T
    for i in range(k):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    np.testing.assert_allclose(lda["components"], ref, atol=1e-7)
    np.testing.assert_allclose(lda["eigvals"], vals[order], atol=1e-9)


def test_lda_k_defaults_to_classes_minus_one_and_projects(spark, emb):
    labeled = emb.withColumn("g", F.col("label").cast("string"))
    n_classes = labeled.select("g").distinct().count()
    lda = reduction.lda_train(labeled, "g")
    assert lda["components"].shape[0] == n_classes - 1
    out = reduction.project(
        labeled, lda["components"], mean=lda["mean"], out_col="lda",
        method="arrow",
    )
    row = out.select("lda").first()
    assert len(row.lda) == n_classes - 1


def test_lda_refuses_degenerate_input(spark, emb):
    one_class = emb.withColumn("g", F.lit("all"))
    with pytest.raises(ValueError, match=">= 2 classes"):
        reduction.lda_train(one_class, "g")


def test_mahalanobis_penalizes_out_of_subspace_deviation(spark, emb):
    """ADVICE r12: with a degenerate (zero-variance) direction in the
    training data, a vector deviating ONLY along that direction must
    clear the chi-square gate — pseudo-inverse-with-penalty semantics,
    not an unwhitened pass-through."""
    import pandas as pd

    d = len(emb.select("embedding").first().embedding)
    # train on data with a constant extra dimension (value 7.0)
    aug = emb.select(
        "vec_id", F.concat("embedding", F.array(F.lit(7.0))).alias("embedding")
    )
    model = reduction.pca_train(aug, k=d + 1)
    assert float(np.min(model["eigvals"])) < 1e-9  # fixture is degenerate
    # anomaly: typical in every trained direction, off ONLY in the
    # constant one (7.0 -> 8.0 — a modest 1.0-unit step)
    mu = model["mean"].copy()
    mu[d] = 8.0
    planted = spark.createDataFrame(
        pd.DataFrame({"vec_id": [999999], "embedding": [mu.tolist()]}),
        "vec_id long, embedding array<double>",
    )
    scored = reduction.mahalanobis_score(
        aug.unionByName(planted), model=model
    )
    gate = (d + 1) + 3 * (2 * (d + 1)) ** 0.5
    row = {r.vec_id: r.maha2 for r in scored.collect()}
    assert row[999999] > gate * 100  # huge, not raw-units ~1.0
    # and the in-subspace rows are NOT inflated by the penalty
    typical = [v for k, v in row.items() if k != 999999]
    assert np.mean(typical) < 2 * (d + 1)


def test_moments_sink_survives_warmup_batches(spark, emb, tmp_path):
    """ADVICE r12: an empty first batch (dim unknown) and an n=1 batch
    must not raise inside the sink path — state accumulates quietly and
    stats appear once n >= 2."""
    path = str(tmp_path / "mom_warmup")
    d = len(emb.select("embedding").first().embedding)
    sink = reduction.moments_sink(spark, path)  # dim NOT passed
    empty = emb.select("embedding").limit(0)
    sink(empty, 0)  # no state yet, no dim -> quiet no-op
    one = emb.select("embedding").limit(1)
    sink(one, 1)  # n=1 saved, stats not yet computable -> quiet
    got = reduction._try_load_moments_state(spark, path)
    assert got is not None and int(got[0][0]) == 1  # state DID accumulate
    sink(one, 1)  # replayed warm-up batch: still quiet, still no raise
    rest = emb.select("embedding")
    sink(rest, 2)
    n, mean, cov = reduction.moments_from_path(spark, path)
    assert n == 1 + emb.count()
    # strict readers still refuse a sub-minimal sketch loudly
    path2 = str(tmp_path / "mom_strict")
    with pytest.raises(ValueError, match=">= 2"):
        reduction.incremental_moments(spark, one, path2, dim=d)


def test_moments_state_survives_torn_write(spark, emb, tmp_path):
    """Crash-safety: a torn (unreadable) newest version directory must
    fall back to the last committed version — totals and bookmark can
    never split (they live in one row of one file)."""
    import os

    path = str(tmp_path / "mom_torn")
    half = emb.filter(F.col("vec_id") % 2 == 0).select("embedding")
    d = len(emb.select("embedding").first().embedding)
    reduction.incremental_moments(spark, half, path, dim=d, batch_id=0)
    committed = reduction.load_moments_state(spark, path)
    # simulate a crash mid-write: a newer version dir with garbage
    versions = reduction._list_state_versions(spark, path)
    torn = f"{path}/state/v={versions[-1] + 1}"
    os.makedirs(torn)
    with open(f"{torn}/part-00000.parquet", "wb") as f:
        f.write(b"\x00not parquet")
    tot2, d2, last2 = reduction.load_moments_state(spark, path)
    np.testing.assert_array_equal(tot2, committed[0])
    assert (d2, last2) == (committed[1], committed[2])
    # and the next fold writes PAST the torn version, then reads back
    reduction.incremental_moments(
        spark, emb.filter(F.col("vec_id") % 2 == 1).select("embedding"),
        path, dim=d, batch_id=1,
    )
    n, _, _ = reduction.moments_from_path(spark, path)
    assert n == emb.count()


def test_grouped_ols_matches_numpy_polyfit(spark, sf_dir):
    """Per-group slope/intercept/r2 from the one-pass sufficient
    statistics must match numpy least squares per group."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        (r.l_returnflag, r.l_linestatus): r
        for r in reduction.grouped_ols(
            li, ["l_returnflag", "l_linestatus"],
            "l_quantity", "l_extendedprice",
            shift_x=25.0, shift_y=35000.0,
        ).collect()
    }
    rows = li.select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r.l_returnflag, r.l_linestatus), []).append(
            (float(r.l_quantity), float(r.l_extendedprice))
        )
    assert set(got) == set(groups)
    for key, pts in groups.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope_ref, b0_ref = np.polyfit(x, y, 1)
        r = got[key]
        assert r.n == len(pts)
        np.testing.assert_allclose(r.slope, slope_ref, rtol=1e-9)
        np.testing.assert_allclose(r.intercept, b0_ref, rtol=1e-9)
        r2_ref = np.corrcoef(x, y)[0, 1] ** 2
        np.testing.assert_allclose(r.r2, r2_ref, rtol=1e-9)


def test_grouped_ols_zero_variance_x_yields_nulls(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 3, "x": [2.0, 2.0, 2.0],
                      "y": [1.0, 2.0, 3.0]})
    )
    r = reduction.grouped_ols(df, ["g"], "x", "y").first()
    assert r.slope is None and r.intercept is None and r.r2 is None
    assert r.n == 3


def test_grouped_ols_stays_jvm_side(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = plan_str(
        reduction.grouped_ols(li, ["l_returnflag"], "l_quantity",
                              "l_extendedprice")
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_drift_psi_zero_on_identical_corpora(spark, emb):
    half = emb.filter(F.col("vec_id") % 2 == 0)
    got = reduction.drift_psi(half, half).collect()
    assert len(got) == 64
    assert all(abs(r.psi) < 1e-12 for r in got)


def test_drift_psi_flags_planted_shift(spark, emb):
    """Shifting ONE dimension of the 'current' corpus by 2σ-ish must
    push that dimension's PSI past the 0.25 action threshold while the
    untouched dimensions stay in the stable band (same-corpus halves
    differ only by sampling noise)."""
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1).withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 7, x + 2.0).otherwise(x),
        ),
    )
    psi = {r.dim: r.psi for r in reduction.drift_psi(ref, cur).collect()}
    assert psi[7] > 0.25, psi[7]
    others = [v for k, v in psi.items() if k != 7]
    assert max(others) < 0.1, max(others)


@pytest.mark.slow
def test_streaming_drift_monitor_end_to_end(spark, emb, tmp_path):
    """Reference histogram → file-stream batches → per-batch PSI rows
    land batch-partitioned; a replayed batch rewrites its own partition
    (idempotent); the shifted batch trips the 0.25 gate on the planted
    dimension only."""
    from realtime_data_pipeline_spark import streaming

    ref = emb.filter(F.col("vec_id") % 2 == 0)
    ref_path = str(tmp_path / "drift_ref")
    reduction.reference_histogram(ref, ref_path)

    sink = reduction.drift_monitor_sink(spark, ref_path,
                                        str(tmp_path / "monitor"))
    # batch 0: the other half of the same corpus -> stable
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    sink(cur.select("embedding"), 0)
    # batch 1: same rows with dim 7 shifted by 2.0 -> action on dim 7
    shifted = cur.select(
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 7, x + 2.0).otherwise(x),
        ).alias("embedding")
    )
    sink(shifted, 1)
    # empty batch: quiet no-op
    sink(cur.select("embedding").limit(0), 2)
    # replay of batch 1: rewrites its partition, no duplication
    sink(shifted, 1)

    mon = spark.read.parquet(str(tmp_path / "monitor"))
    got = {(r.batch_id, r.dim): r.psi for r in mon.collect()}
    assert len(got) == 2 * 64  # two real batches x 64 dims, no dupes
    assert got[(1, 7)] > 0.25
    stable = [v for (b, d), v in got.items() if not (b == 1 and d == 7)]
    assert max(stable) < 0.1
    assert {r.n_rows for r in mon.collect()} == {cur.count()}


def test_ridge_fit_matches_numpy_lstsq(spark, emb, X):
    """OLS (l2=0) from the one-pass augmented moments must match the
    numpy normal-equation solution on a synthetic linear target."""
    rng = np.random.RandomState(5)
    w_true = rng.standard_normal(X.shape[1])
    y = X @ w_true + 0.5 + 0.01 * rng.standard_normal(X.shape[0])
    import pandas as pd

    ydf = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(len(y)), "y": y}),
        "vec_id long, y double",
    )
    data = emb.select("vec_id", "embedding").join(ydf, "vec_id")
    model = reduction.ridge_fit(data, "embedding", "y")
    Xc = np.column_stack([X, np.ones(len(X))])
    ref, *_ = np.linalg.lstsq(Xc, y, rcond=None)
    np.testing.assert_allclose(model["beta"], ref[:-1], atol=1e-7)
    np.testing.assert_allclose(model["intercept"], ref[-1], atol=1e-7)
    assert model["r2"] > 0.999  # near-noiseless linear target
    assert model["n"] == len(y)
    # scoring parity: distributed y_hat equals the numpy prediction
    scored = reduction.ridge_predict(data, model).select(
        "vec_id", "y_hat"
    ).collect()
    scored.sort(key=lambda r: r.vec_id)
    got = np.array([r.y_hat for r in scored])
    np.testing.assert_allclose(
        got, Xc @ ref, atol=1e-6
    )


def test_ridge_l2_shrinks_coefficients(spark, emb, X):
    rng = np.random.RandomState(6)
    y = X @ rng.standard_normal(X.shape[1])
    import pandas as pd

    ydf = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(len(y)), "y": y}),
        "vec_id long, y double",
    )
    data = emb.select("vec_id", "embedding").join(ydf, "vec_id")
    ols = reduction.ridge_fit(data, "embedding", "y", l2=0.0)
    rr = reduction.ridge_fit(data, "embedding", "y", l2=10.0)
    assert np.linalg.norm(rr["beta"]) < np.linalg.norm(ols["beta"])
    # ridge reference: (Sxx + λI)β = Sxy on centered data
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    d = X.shape[1]
    Sxx = (Xc.T @ Xc) / (len(X) - 1)
    Sxy = (Xc.T @ yc) / (len(X) - 1)
    ref = np.linalg.solve(Sxx + 10.0 * np.eye(d), Sxy)
    np.testing.assert_allclose(rr["beta"], ref, atol=1e-8)


def test_drift_ttest_detects_planted_mean_shift(spark, emb):
    """A 0.5-unit mean shift on one dimension must blow past |t|=3
    while untouched dimensions stay below it (same-corpus halves)."""
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1).withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 3, x + 0.5).otherwise(x),
        ),
    )
    t = {r.dim: r.t for r in reduction.drift_ttest(ref, cur).collect()}
    assert t[3] > 3.0, t[3]
    assert max(abs(v) for k, v in t.items() if k != 3) < 3.0


def test_drift_family_stays_jvm_side(spark, emb):
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    for df in (reduction.drift_psi(ref, cur),
               reduction.drift_ttest(ref, cur)):
        plan = plan_str(df)
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "Generate" in plan  # the posexplode fuses map-side


def test_cli_drift_gate_exit_codes(spark, emb, tmp_path, capsys):
    """`rdp drift` exits 0 on same-corpus halves and 1 when a planted
    shift crosses a gate; the JSON summary names the flagged dims."""
    import json as _json

    from realtime_data_pipeline_spark import cli

    ref_p = str(tmp_path / "ref.parquet")
    cur_p = str(tmp_path / "cur.parquet")
    shift_p = str(tmp_path / "shifted.parquet")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    ref.write.parquet(ref_p)
    cur.write.parquet(cur_p)
    cur.withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 5, x + 2.0).otherwise(x),
        ),
    ).write.parquet(shift_p)

    assert cli.main(["drift", "--ref", ref_p, "--cur", cur_p]) == 0
    capsys.readouterr()
    assert cli.main(["drift", "--ref", ref_p, "--cur", shift_p]) == 1
    out = capsys.readouterr().out
    summary = _json.loads(out.strip().splitlines()[-1])
    assert 5 in summary["flagged_dims"]
    assert summary["worst_t"]["dim"] == 5 or summary["worst_psi"]["dim"] == 5


@pytest.mark.slow
def test_cli_drift_persisted_reference_mode(spark, emb, tmp_path, capsys):
    """--ref ... --save-ref-hist persists the reference; --ref-hist then
    gates PSI-only against it with the same exit-code contract."""
    import json as _json

    from realtime_data_pipeline_spark import cli

    ref_p = str(tmp_path / "ref.parquet")
    shift_p = str(tmp_path / "shifted.parquet")
    hist_p = str(tmp_path / "ref_hist")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    ref.write.parquet(ref_p)
    cur.withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 9, x + 2.0).otherwise(x),
        ),
    ).write.parquet(shift_p)

    # build + save the reference in one clean pass (exit 0: ref vs ref)
    assert cli.main([
        "drift", "--ref", ref_p, "--cur", ref_p,
        "--save-ref-hist", hist_p,
    ]) == 0
    capsys.readouterr()
    # persisted-reference mode flags the shifted corpus
    assert cli.main(["drift", "--ref-hist", hist_p, "--cur", shift_p]) == 1
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 9 in summary["flagged_dims"]
    # both refs given -> loud refusal
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["drift", "--ref", ref_p, "--ref-hist", hist_p,
                  "--cur", shift_p])
    with _pytest.raises(SystemExit):
        cli.main(["drift", "--cur", shift_p])


def test_grouped_ols_null_pairs_excluded_like_regr(spark):
    """ADVICE r13: a row with NULL x or y is excluded from EVERY
    statistic including n (REGR_* semantics), and an all-NULL group
    still appears with n=0 and NULL fit columns."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": ["a", "a", "a", "a", "b", "b"],
                "x": [1.0, 2.0, None, 3.0, None, 4.0],
                "y": [2.0, 4.0, 9.0, None, 1.0, None],
            }
        )
    )
    got = {r.g: r for r in reduction.grouped_ols(df, ["g"], "x", "y").collect()}
    # group a: only (1,2) and (2,4) are complete pairs -> slope 2, b0 0
    assert got["a"].n == 2
    np.testing.assert_allclose(got["a"].slope, 2.0, rtol=1e-12)
    np.testing.assert_allclose(got["a"].intercept, 0.0, atol=1e-12)
    # group b: zero complete pairs -> present, n=0, NULL fit
    assert got["b"].n == 0
    assert got["b"].slope is None and got["b"].r2 is None


def test_grouped_ols_subnormal_span_returns_nulls_not_raise(spark):
    """The r13 falsifying input: a subnormal x-span whose float64
    vx = n*sxx - sx**2 underflows to exactly 0.0 takes the documented
    zero-x-variance NULL branch — no raise, no bogus slope."""
    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 2.2e-309, 0.0)], "g string, x double, y double"
    )
    r = reduction.grouped_ols(df, ["g"], "x", "y").first()
    assert r.n == 2
    assert r.slope is None and r.intercept is None and r.r2 is None


def test_moments_state_legacy_layout_migrates(spark, emb, tmp_path):
    """ADVICE r13: a pre-versioned {path}/totals + {path}/meta sketch
    must be read as EXISTING state (migrated into state/v=0), never
    silently re-zeroed; a corrupt legacy layout fails loudly."""
    import pandas as pd

    path = str(tmp_path / "mom_legacy")
    half = emb.filter(F.col("vec_id") % 2 == 0).select("embedding")
    d = len(emb.select("embedding").first().embedding)
    tot = reduction._batch_totals(half, "embedding", d)
    # write the legacy two-file layout exactly as pre-r13 code did
    reduction._write_one_file(
        spark,
        pd.DataFrame({"pos": np.arange(len(tot), dtype=np.int64), "val": tot}),
        "pos long, val double",
        f"{path}/totals",
    )
    reduction._write_one_file(
        spark,
        pd.DataFrame({"dim": [d], "last_batch_id": [7]}),
        "dim int, last_batch_id long",
        f"{path}/meta",
    )
    got_tot, got_d, got_last = reduction.load_moments_state(spark, path)
    np.testing.assert_allclose(got_tot, tot, rtol=1e-12)
    assert (got_d, got_last) == (d, 7)
    assert reduction._list_state_versions(spark, path) == [0]
    # replay guard carried over: batch_id <= migrated bookmark is a no-op
    n0 = int(got_tot[0])
    reduction.incremental_moments(spark, half, path, dim=d, batch_id=7)
    assert int(reduction.load_moments_state(spark, path)[0][0]) == n0
    # and a NEW batch folds on top of the migrated history
    rest = emb.filter(F.col("vec_id") % 2 == 1).select("embedding")
    n, _, _ = reduction.incremental_moments(
        spark, rest, path, dim=d, batch_id=8
    )
    assert n == emb.count()
    # corrupt legacy layout: loud error, not silent re-init
    import os

    bad = str(tmp_path / "mom_legacy_bad")
    os.makedirs(f"{bad}/meta")
    os.makedirs(f"{bad}/totals")
    with open(f"{bad}/meta/part-00000.parquet", "wb") as f:
        f.write(b"\x00not parquet")
    with open(f"{bad}/totals/part-00000.parquet", "wb") as f:
        f.write(b"\x00not parquet")
    with pytest.raises(RuntimeError, match="legacy moments state"):
        reduction._try_load_moments_state(spark, bad)
    # torn legacy layout (exactly ONE of meta/totals, ADVICE r14): loud
    # error too — falling through would re-zero accumulated history
    torn = str(tmp_path / "mom_legacy_torn")
    reduction._write_one_file(
        spark,
        pd.DataFrame({"dim": [d], "last_batch_id": [7]}),
        "dim int, last_batch_id long",
        f"{torn}/meta",
    )
    with pytest.raises(RuntimeError, match="legacy moments state"):
        reduction._try_load_moments_state(spark, torn)


def test_batch_drift_psi_matches_two_corpus_psi_and_broadcasts(
    spark, emb, tmp_path
):
    """The persisted-reference PSI must equal the two-corpus operator
    bin-for-bin (same geometry, same ε), and its executed plan must be
    broadcast joins over the generated (dim, bin) grid — no full-outer
    fallback to a shuffled join (ADVICE r13: the old broadcast hint on a
    full_outer join was silently ignored)."""
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ref_hist")
    reduction.reference_histogram(ref, path)
    got = {
        r.dim: r.psi
        for r in reduction.batch_drift_psi(spark, cur, path).collect()
    }
    want = {r.dim: r.psi for r in reduction.drift_psi(ref, cur).collect()}
    assert set(got) == set(want)
    for dim, psi in want.items():
        assert abs(got[dim] - psi) < 2e-6  # both sides round to 1e-6
    plan = plan_str(reduction.batch_drift_psi(spark, cur, path))
    assert "BroadcastHashJoin" in plan
    assert "FullOuter" not in plan and "full_outer" not in plan


def test_cli_drift_edge_inputs_no_crash(spark, emb, tmp_path, capsys):
    """ADVICE r13 edge cases: a single-row reference makes Welch t NULL
    on every dim (var_samp undefined) — NULL t is 'no evidence', never a
    TypeError and never a flag; empty corpora produce a summary with no
    worst_* and exit 0 instead of ValueError on max()."""
    import json as _json

    from realtime_data_pipeline_spark import cli

    one_p = str(tmp_path / "one.parquet")
    cur_p = str(tmp_path / "cur.parquet")
    empty_p = str(tmp_path / "empty.parquet")
    emb.limit(1).write.parquet(one_p)
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(cur_p)
    emb.limit(0).write.parquet(empty_p)

    # NULL t path: must not raise; psi still gates
    rc = cli.main(["drift", "--ref", one_p, "--cur", cur_p])
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 1)
    assert "worst_t" not in summary  # every t NULL -> no worst_t
    assert "worst_psi" in summary

    # empty-vs-empty: zero dims measured -> exit 0, no worst_*
    rc = cli.main(["drift", "--ref", empty_p, "--cur", empty_p])
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert summary["n_dims"] == 0 and summary["flagged_dims"] == []
    assert "worst_psi" not in summary and "worst_t" not in summary


def test_cli_drift_ks_gate_catches_variance_only_shift(
    spark, tmp_path, capsys
):
    """Round-15: the CLI's two-corpus mode gains the distribution-free
    KS column — a variance-only change with an unmoved mean INSIDE one
    PSI bin is invisible to both existing gates and must be caught by
    KS alone (exit 1, the dim in flagged_dims, worst_ks in the
    summary)."""
    import json as _json

    import pandas as pd

    from realtime_data_pipeline_spark import cli

    rng = np.random.RandomState(37)
    n, d = 400, 3
    ref_x = 0.4 + 0.02 * rng.randn(n, d)       # all mass mid-bin
    cur_x = 0.4 + 0.02 * rng.randn(n, d)
    cur_x[:, 1] = 0.4 + 0.06 * rng.randn(n)    # 3x sigma, same mean,
    # still inside the [0, 0.8) bin
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"embedding": [row.tolist() for row in m]})
    )
    ref_p, cur_p = str(tmp_path / "ref.parquet"), str(tmp_path / "cur.parquet")
    mk(ref_x).write.parquet(ref_p)
    mk(cur_x).write.parquet(cur_p)
    rc = cli.main(["drift", "--ref", ref_p, "--cur", cur_p])
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert summary["flagged_dims"] == [1]
    assert summary["worst_ks"]["dim"] == 1
    # the existing gates were indeed blind to it
    assert summary["worst_psi"]["psi"] <= 0.25
    assert "worst_t" not in summary or abs(summary["worst_t"]["t"]) <= 3.0
    assert summary["gates"]["ks_alpha"] == 0.01


def test_grouped_ols_outliers_flags_conditional_anomaly(spark):
    """A row far off its group's fitted LINE must be flagged even when
    its y is unremarkable MARGINALLY (the point of regression residuals
    vs a plain z-score), clean rows must not be, and NULL-pair /
    degenerate groups contribute nothing."""
    import pandas as pd

    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(1, 21)]
    rows[7] = ("a", 8.0, 2.0 * 8 + 1.0 + 25.0)  # off the line by +25
    # y=42 is INSIDE group a's marginal y range [3, 41+25] — only the
    # residual sees it; x=2 predicts y=5
    rows.append(("a", 2.0, 42.0))
    rows += [("b", 1.0, 1.0), ("b", 1.0, 9.0)]      # n<=2: no scale
    rows += [("c", None, 1.0), ("c", 2.0, None)]    # null pairs drop
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = reduction.grouped_ols_outliers(df, ["g"], "x", "y", z_gate=2.0)
    flagged = {(r.g, r.x, r.y) for r in got.collect()}
    assert ("a", 8.0, 42.0) in flagged
    assert ("a", 2.0, 42.0) in flagged
    assert all(g == "a" for g, _, _ in flagged)
    assert len(flagged) == 2  # the 20 on-line rows stay quiet
    # a marginal z-score would NOT flag (2.0, 42.0): y=42 sits inside
    # the group's y spread
    ys = [y for g, x, y in rows if g == "a" and y is not None]
    import numpy as np

    z_marginal = abs(42.0 - np.mean(ys)) / np.std(ys)
    assert z_marginal < 2.0


def test_grouped_ols_outliers_stays_jvm_side(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = plan_str(
        reduction.grouped_ols_outliers(
            li, ["l_returnflag"], "l_quantity", "l_extendedprice",
            z_gate=0.0,
        )
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_label_anova_f_matches_scipy_formula(spark, emb):
    """F per dimension equals the textbook between/within decomposition
    computed in numpy over the same data (and the planted separable
    dimension scores far above the noise dims)."""
    rows = emb.select("label", "embedding").collect()
    got = {r.dim: r for r in reduction.label_anova_f(emb).collect()}
    import collections

    by_label = collections.defaultdict(list)
    for r in rows:
        by_label[r.label].append(np.asarray(r.embedding, dtype=np.float64))
    groups = {g: np.vstack(v) for g, v in by_label.items()}
    d = next(iter(groups.values())).shape[1]
    assert set(got) == set(range(d))
    all_x = np.vstack(list(groups.values()))
    for dim in range(d):
        xs = [m[:, dim] for m in groups.values()]
        k = len(xs)
        n_tot = sum(len(x) for x in xs)
        grand = all_x[:, dim].mean()
        ssb = sum(len(x) * (x.mean() - grand) ** 2 for x in xs)
        ssw = sum(((x - x.mean()) ** 2).sum() for x in xs)
        f_ref = (ssb / (k - 1)) / (ssw / (n_tot - k))
        np.testing.assert_allclose(got[dim].f, f_ref, rtol=1e-9)
        assert got[dim].k == k and got[dim].n == n_tot


def test_grouped_ols_bands_cover_and_match_numpy_quantiles(spark):
    """The bands are the exact residual quantiles (numpy linear
    interpolation ≡ Spark exact percentile) and bracket ~coverage of
    the data; degenerate groups return NULL bands."""
    import pandas as pd

    rng = np.random.RandomState(7)
    x = rng.uniform(0, 10, 400)
    y = 3.0 * x + 2.0 + rng.normal(0, 1.5, 400)
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 400, "x": x, "y": y})
    )
    const = spark.createDataFrame(
        pd.DataFrame({"g": ["z"] * 3, "x": [1.0] * 3, "y": [1.0, 2.0, 3.0]})
    )
    out = {
        r.g: r
        for r in reduction.grouped_ols_bands(
            df.unionByName(const), ["g"], "x", "y", coverage=0.9
        ).collect()
    }
    a = out["a"]
    resid = y - (a.slope * x + a.intercept)
    np.testing.assert_allclose(
        a.r_lo, np.quantile(resid, 0.05), rtol=1e-9
    )
    np.testing.assert_allclose(
        a.r_hi, np.quantile(resid, 0.95), rtol=1e-9
    )
    inside = ((resid >= a.r_lo) & (resid <= a.r_hi)).mean()
    assert 0.85 <= inside <= 0.95
    z = out["z"]  # zero x-variance: fit undefined, bands NULL
    assert z.slope is None and z.r_lo is None and z.r_hi is None


def test_grouped_ols2_matches_numpy_lstsq(spark):
    """Round-15: the closed-form 2×2 normal-equation solve must match
    numpy's least squares on a well-conditioned grouped scatter;
    NULL-in-any-coordinate rows are excluded REGR_*-style; collinear
    and constant-regressor groups return NULL coefficients instead of
    an ANSI division error."""
    import pandas as pd

    rng = np.random.RandomState(9)
    n = 500
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-2, 2, n) + 0.3 * x1  # correlated regressors
    y = 4.0 + 2.5 * x1 - 7.0 * x2 + rng.normal(0, 1.0, n)
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * n, "x1": x1, "x2": x2, "y": y})
    )
    extra = spark.createDataFrame(
        [
            ("a", None, 1.0, 1.0),       # NULL x1: excluded from n too
            ("col", 1.0, 2.0, 5.0),      # x2 = 2*x1: collinear
            ("col", 2.0, 4.0, 7.0),
            ("col", 3.0, 6.0, 9.0),
            ("col", 4.0, 8.0, 12.0),
        ],
        "g string, x1 double, x2 double, y double",
    )
    out = {
        r.g: r
        for r in reduction.grouped_ols2(
            df.unionByName(extra), ["g"], "x1", "x2", "y"
        ).collect()
    }
    a = out["a"]
    assert a.n == n  # the NULL-pair row joined group a but never counted
    A = np.column_stack([np.ones(n), x1, x2])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    np.testing.assert_allclose(a.intercept, beta[0], rtol=1e-8)
    np.testing.assert_allclose(a.b1, beta[1], rtol=1e-9)
    np.testing.assert_allclose(a.b2, beta[2], rtol=1e-9)
    resid = y - A @ beta
    r2_ref = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    np.testing.assert_allclose(a.r2, r2_ref, rtol=1e-9)
    c = out["col"]  # det = 0: no unique solution, all-NULL fit
    assert c.b1 is None and c.b2 is None and c.r2 is None


def test_drift_ks_matches_numpy_and_sees_variance_shift(spark):
    """Round-15: the two-sample KS must equal the numpy empirical-CDF
    sup-distance exactly (ties collapse to distinct values, so the
    statistic is order-free), read ~0 on identical corpora, and fire
    on a VARIANCE-ONLY change — the shift Welch t is blind to (equal
    means) and a coarse bin grid can underread."""
    import pandas as pd

    rng = np.random.RandomState(29)
    n, d = 400, 3
    ref_x = rng.randn(n, d)
    cur_x = rng.randn(n, d)
    cur_x[:, 1] *= 3.0  # variance blowup, mean unchanged (dim 1)
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"embedding": [row.tolist() for row in m]})
    )
    got = {
        r.dim: r
        for r in reduction.drift_ks(mk(ref_x), mk(cur_x)).collect()
    }
    assert got[0].n_ref == n and got[0].n_cur == n

    def ks_np(a, b):
        xs = np.sort(np.unique(np.concatenate([a, b])))
        fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
        return np.abs(fa - fb).max()

    for dim in range(d):
        np.testing.assert_allclose(
            got[dim].ks, ks_np(ref_x[:, dim], cur_x[:, dim]), atol=5e-7
        )
    gate = 1.63 * np.sqrt(2 * n / (n * n))  # c(0.01) two-sample gate
    assert got[1].ks > gate          # the variance shift fires...
    assert got[0].ks < gate and got[2].ks < gate  # ...quiet dims don't
    # and the mean gate is blind to it, as designed
    t = {r.dim: r.t for r in
         reduction.drift_ttest(mk(ref_x), mk(cur_x)).collect()}
    assert abs(t[1]) < 3.0
    # identical corpora: D == 0 exactly
    same = reduction.drift_ks(mk(ref_x), mk(ref_x)).collect()
    assert all(r.ks == 0.0 for r in same)


def test_grouped_gini_matches_mean_abs_difference_formula(spark):
    """Round-15: the rank-formula Gini must equal the independent
    mean-absolute-difference definition G = Σ|xi−xj| / (2n²·mean) on
    random data, read 0 on perfect equality, (n−1)/n on total
    concentration, and NULL on a zero-total group."""
    import pandas as pd

    rng = np.random.RandomState(23)
    x = rng.exponential(100.0, 300)
    rows = [("r", f"k{i}", float(v)) for i, v in enumerate(x)]
    rows += [("eq", f"k{i}", 5.0) for i in range(10)]
    rows += [("one", "a", 0.0), ("one", "b", 0.0),
             ("one", "c", 0.0), ("one", "d", 10.0)]
    rows += [("zero", "a", 0.0), ("zero", "b", 0.0)]
    df = spark.createDataFrame(rows, "g string, k string, x double")
    out = {
        r.g: r
        for r in reduction.grouped_gini(df, ["g"], "x", "k").collect()
    }
    gini_ref = np.abs(x[:, None] - x[None, :]).sum() / (
        2 * len(x) ** 2 * x.mean()
    )
    np.testing.assert_allclose(out["r"].gini, gini_ref, rtol=1e-9)
    assert abs(out["eq"].gini) < 1e-12
    np.testing.assert_allclose(out["one"].gini, 0.75, rtol=1e-12)
    assert out["zero"].gini is None  # zero total: undefined, not 0/0


def test_cramers_v_extremes_and_numpy_chi2(spark):
    """Round-15: V = 1 on a perfect mapping, ≈ 0 under independence,
    and the absent-cell χ² equals the numpy full-grid contingency χ²
    exactly on a table WITH empty cells."""
    import itertools

    import pandas as pd

    # perfect association: b = f(a)
    perfect = spark.createDataFrame(
        [(f"a{i % 3}", f"b{i % 3}") for i in range(90)], "a string, b string"
    )
    v1 = reduction.cramers_v(perfect, "a", "b").first()
    np.testing.assert_allclose(v1.v, 1.0, rtol=1e-9)
    assert (v1.r, v1.c) == (3, 3)
    # independence: uniform product measure
    indep = spark.createDataFrame(
        [
            (f"a{i}", f"b{j}")
            for i, j in itertools.product(range(3), range(4))
            for _ in range(25)
        ],
        "a string, b string",
    )
    v0 = reduction.cramers_v(indep, "a", "b").first()
    assert abs(v0.v) < 1e-9 and v0.n == 300
    # sparse table with EMPTY cells: absent-cell algebra == full grid
    rng = np.random.RandomState(31)
    rows = [
        (f"a{rng.randint(4)}", f"b{rng.randint(5)}") for _ in range(400)
    ]
    rows = [r for r in rows if not (r[0] == "a0" and r[1] == "b0")]
    sparse = spark.createDataFrame(rows, "a string, b string")
    got = reduction.cramers_v(sparse, "a", "b").first()
    avals = sorted({r[0] for r in rows})
    bvals = sorted({r[1] for r in rows})
    obs = np.zeros((len(avals), len(bvals)))
    for a, b in rows:
        obs[avals.index(a), bvals.index(b)] += 1
    e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    chi2_ref = ((obs - e) ** 2 / e).sum()
    np.testing.assert_allclose(got.chi2, chi2_ref, rtol=1e-9)


def test_grouped_entropy_uniform_and_degenerate(spark):
    """Round-15: uniform 4-way split reads exactly 2 bits with
    evenness 1; a single-category group reads 0 bits with NULL
    evenness (log2(1) denominator); NULL categories are excluded."""
    rows = [("u", c) for c in ("a", "b", "c", "d") for _ in range(25)]
    rows += [("mono", "only")] * 10
    rows += [("skew", "x")] * 99 + [("skew", "y")]
    rows += [("u", None)]  # excluded, not a category
    df = spark.createDataFrame(rows, "g string, cat string")
    out = {
        r.g: r
        for r in reduction.grouped_entropy(df, ["g"], "cat").collect()
    }
    u = out["u"]
    assert (u.n, u.n_cats) == (100, 4)
    np.testing.assert_allclose(u.entropy_bits, 2.0, rtol=1e-12)
    np.testing.assert_allclose(u.evenness, 1.0, rtol=1e-12)
    m = out["mono"]
    assert m.entropy_bits == 0.0 and m.evenness is None
    s = out["skew"]
    p = np.array([0.99, 0.01])
    np.testing.assert_allclose(
        s.entropy_bits, -(p * np.log2(p)).sum(), rtol=1e-12
    )


def test_grouped_partial_corr_matches_numpy_and_kills_confounder(spark):
    """Round-15: the partial correlation must match the textbook
    formula on numpy-computed pairwise correlations, and on a
    constructed confounder (x and y both driven by z, no direct link)
    it must read ≈ 0 where the raw correlation reads large — the
    operator's reason to exist. Degenerate groups return NULL."""
    import pandas as pd

    rng = np.random.RandomState(17)
    n = 800
    z = rng.randn(n)
    x = 2.0 * z + 0.5 * rng.randn(n)   # both driven by z only
    y = -3.0 * z + 0.5 * rng.randn(n)
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["conf"] * n, "x": x, "y": y, "z": z})
    )
    degen = spark.createDataFrame(
        [("d", 1.0, float(v), float(v * 2)) for v in range(5)],
        "g string, x double, y double, z double",
    )  # constant x: corr undefined
    out = {
        r.g: r
        for r in reduction.grouped_partial_corr(
            df.unionByName(degen), ["g"], "x", "y", "z"
        ).collect()
    }
    c = out["conf"]
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    rzy = np.corrcoef(z, y)[0, 1]
    want = (rxy - rxz * rzy) / np.sqrt((1 - rxz**2) * (1 - rzy**2))
    np.testing.assert_allclose(c.r_xy, rxy, rtol=1e-9)
    np.testing.assert_allclose(c.r_xy_z, want, rtol=1e-7)
    assert abs(c.r_xy) > 0.9      # the confounded raw correlation
    assert abs(c.r_xy_z) < 0.1    # ...vanishes once z is controlled
    d = out["d"]
    assert d.r_xy is None and d.r_xy_z is None


def test_grouped_ols_conformal_bands_holds_out_calibration(spark):
    """Round-15 (verdict r14 item #6): the split-conformal sibling must
    fit on EXACTLY the md5 fit half and take band quantiles on EXACTLY
    the held-out calibration half — verified against numpy replicating
    the md5 gate row by row — and held-out coverage must sit near the
    nominal level. Degenerate fit halves return NULL fit and bands."""
    import hashlib

    import pandas as pd

    rng = np.random.RandomState(13)
    n = 600
    x = rng.uniform(0, 10, n)
    y = 3.0 * x + 2.0 + rng.normal(0, 1.5, n)
    key = [f"k{i}" for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * n, "k": key, "x": x, "y": y})
    )
    const = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["z"] * 4, "k": [f"c{i}" for i in range(4)],
             "x": [1.0] * 4, "y": [1.0, 2.0, 3.0, 4.0]}
        )
    )
    out = {
        r.g: r
        for r in reduction.grouped_ols_conformal_bands(
            df.unionByName(const), ["g"], "x", "y", "k", coverage=0.9
        ).collect()
    }
    a = out["a"]
    is_fit = np.array(
        [hashlib.md5(s.encode()).hexdigest()[0] <= "7" for s in key]
    )
    assert a.n_fit == int(is_fit.sum())
    assert a.n_cal == int((~is_fit).sum())
    slope_ref, b0_ref = np.polyfit(x[is_fit], y[is_fit], 1)
    np.testing.assert_allclose(a.slope, slope_ref, rtol=1e-9)
    np.testing.assert_allclose(a.intercept, b0_ref, rtol=1e-8)
    resid_cal = y[~is_fit] - (a.slope * x[~is_fit] + a.intercept)
    np.testing.assert_allclose(
        a.r_lo, np.quantile(resid_cal, 0.05), rtol=1e-9
    )
    np.testing.assert_allclose(
        a.r_hi, np.quantile(resid_cal, 0.95), rtol=1e-9
    )
    # held-out coverage ≈ nominal (exchangeability, not reuse)
    inside = ((resid_cal >= a.r_lo) & (resid_cal <= a.r_hi)).mean()
    assert 0.85 <= inside <= 0.95
    z = out["z"]  # constant x in the fit half: NULL fit + bands
    assert z.slope is None and z.r_lo is None and z.r_hi is None


@pytest.mark.slow
def test_streaming_monitor_welch_t_catches_within_bin_shift(
    spark, tmp_path
):
    """Round-14: the monitor reference persists per-dim stats next to
    the histogram, so the streaming gate gains the Welch-t mean-shift
    check. The motivating blind spot, constructed exactly: a corpus
    whose mass sits MID-BIN (N(0.4, 0.05) inside the [0, 0.8) bin)
    shifted by +0.1 — every value stays in the same bin, PSI reads ~0,
    the t gate fires. A pre-r14 reference (no stats file) keeps the
    sink PSI-only."""
    import shutil

    import pandas as pd

    rng = np.random.RandomState(11)
    d, n = 4, 260
    base = 0.4 + 0.05 * rng.randn(2 * n, d)
    ref_x, cur_x = base[:n], base[n:].copy()
    cur_x[:, 1] += 0.1  # within-bin shift on dim 1
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"embedding": [row.tolist() for row in m]})
    )
    ref_path = str(tmp_path / "ref")
    out_path = str(tmp_path / "mon")
    reduction.reference_histogram(mk(ref_x), ref_path)
    cur = mk(cur_x)
    psi = {r.dim: r.psi for r in
           reduction.batch_drift_psi(spark, cur, ref_path).collect()}
    assert abs(psi[1]) < 0.01  # mass never leaves the bin: PSI blind
    t = {r.dim: r.t for r in
         reduction.batch_drift_ttest(spark, cur, ref_path).collect()}
    assert abs(t[1]) > 3.0  # ...but the mean-shift gate fires
    quiet = [abs(v) for dd, v in t.items() if dd != 1 and v is not None]
    assert max(quiet) < 3.0  # untouched dims stay under the gate
    # monitor sink lands (dim, psi, t, ks, n_rows) exactly-once
    sink = reduction.drift_monitor_sink(spark, ref_path, out_path)
    sink(cur, 0)
    landed = spark.read.parquet(out_path)
    assert set(landed.columns) == {
        "dim", "psi", "t", "ks", "n_rows", "batch_id"
    }
    r1 = landed.filter(F.col("dim") == 1).first()
    assert abs(r1.t) > 3.0 and abs(r1.psi) < 0.01
    sink(cur, 0)  # replay: rewrites its own partition, no duplication
    assert spark.read.parquet(out_path).count() == d  # fresh read: the
    # overwrite replaced the files the old DataFrame handle pointed at
    # pre-r14 reference: no stats/sample files -> PSI-only schema
    shutil.rmtree(f"{ref_path}/stats")
    shutil.rmtree(f"{ref_path}/sample")
    out2 = str(tmp_path / "mon2")
    sink2 = reduction.drift_monitor_sink(spark, ref_path, out2)
    sink2(cur, 0)
    assert set(spark.read.parquet(out2).columns) == {
        "dim", "psi", "n_rows", "batch_id"
    }


@pytest.mark.slow
def test_streaming_monitor_ks_catches_variance_shift_sample_is_deterministic(
    spark, tmp_path, capsys
):
    """Round-15: the monitor's third gate end-to-end — a mid-bin
    variance-only shift (mean unmoved, all mass inside one PSI bin) is
    invisible to BOTH the PSI and Welch-t columns and must be caught
    by the ks column computed against the persisted per-dim value
    sample. The sample itself must be a deterministic function of the
    reference corpus (two builds produce identical files' content) and
    bounded at sample_per_dim values per dim."""
    import pandas as pd

    rng = np.random.RandomState(41)
    d, n = 3, 900
    ref_x = 0.4 + 0.02 * rng.randn(n, d)
    cur_x = 0.4 + 0.02 * rng.randn(300, d)
    cur_x[:, 1] = 0.4 + 0.06 * rng.randn(300)  # 3x sigma, same mean
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"embedding": [row.tolist() for row in m]})
    )
    p1, p2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    reduction.reference_histogram(mk(ref_x), p1, sample_per_dim=256)
    reduction.reference_histogram(mk(ref_x), p2, sample_per_dim=256)
    s1 = sorted(
        (r.dim, r.x) for r in spark.read.parquet(f"{p1}/sample").collect()
    )
    s2 = sorted(
        (r.dim, r.x) for r in spark.read.parquet(f"{p2}/sample").collect()
    )
    assert s1 == s2                       # deterministic sample
    per_dim = {}
    for dim, _ in s1:
        per_dim[dim] = per_dim.get(dim, 0) + 1
    assert per_dim == {i: 256 for i in range(d)}  # bounded at m
    # monitor lands all three columns; only ks sees the shift
    out = str(tmp_path / "mon")
    reduction.drift_monitor_sink(spark, p1, out)(mk(cur_x), 0)
    rows = {r.dim: r for r in reduction.read_drift_monitor(
        spark, out).collect()}
    gate = 1.63 * ((256 + 300) / (256 * 300)) ** 0.5
    assert rows[1].ks > gate
    assert abs(rows[1].psi) < 0.25 and abs(rows[1].t) < 3.0
    assert rows[0].ks < gate and rows[2].ks < gate
    # and the CLI persisted mode GATES on the same ks column (ADVICE
    # r15: it used to show-and-drop it) — psi/t are quiet on this
    # shift, so the exit-1 can only come from the KS gate, and the
    # summary must carry the gate level, the worst dim and the
    # persisted-sample size the threshold used
    import json as _json

    from realtime_data_pipeline_spark import cli

    cur_p = str(tmp_path / "cur.parquet")
    mk(cur_x).write.parquet(cur_p)
    capsys.readouterr()
    rc = cli.main(["drift", "--ref-hist", p1, "--cur", cur_p])
    out = capsys.readouterr().out
    summary = _json.loads(out.strip().splitlines()[-1])
    assert rc == 1
    assert summary["flagged_dims"] == [1]
    assert summary["gates"]["ks_alpha"] == 0.01
    assert summary["worst_ks"]["dim"] == 1
    assert summary["n_ref_sample"] == 256
    # the shown table carries the ks/ks_flag columns
    assert " ks_flag" in out or "|ks_flag" in out
    # a permissive alpha uses the closed-form c(alpha), not a silent
    # c(0.01) fallback (ADVICE r15): at alpha=0.5 the threshold is
    # LOWER, so the same shift must still flag
    capsys.readouterr()
    assert cli.main([
        "drift", "--ref-hist", p1, "--cur", cur_p, "--ks-alpha", "0.5",
    ]) == 1
    s2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["gates"]["ks_alpha"] == 0.5
    # out-of-range alpha refuses loudly instead of gating at c(0.01)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main([
            "drift", "--ref-hist", p1, "--cur", cur_p,
            "--ks-alpha", "0",
        ])


@pytest.mark.slow
def test_drift_monitor_mixed_fleet_upgrades_in_place(spark, tmp_path):
    """Round-15 (verdict r14 item #7): the upgrade story end-to-end —
    a PSI-only era (pre-r14 reference, no stats file) lands batches 0
    and 1; the reference is rebuilt in place WITH stats; a new monitor
    (query restart) lands batch 2 with the Welch-t column. The merged
    read must keep ALL three partitions (no replay loss), surface t as
    NULL for the old era and real for the new, and a replay of an old
    batch through the upgraded monitor must rewrite only its own
    partition."""
    import shutil

    import pandas as pd

    rng = np.random.RandomState(21)
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"embedding": [row.tolist() for row in m]})
    )
    d = 3
    ref_x = 0.4 + 0.05 * rng.randn(300, d)
    batches = [0.4 + 0.05 * rng.randn(120, d) for _ in range(3)]
    batches[2][:, 1] += 0.1  # the new era has something for t to see
    ref_path, out = str(tmp_path / "ref"), str(tmp_path / "mon")
    reduction.reference_histogram(mk(ref_x), ref_path)
    shutil.rmtree(f"{ref_path}/stats")   # pre-r14 era reference
    shutil.rmtree(f"{ref_path}/sample")  # (no t, no ks)
    old_sink = reduction.drift_monitor_sink(spark, ref_path, out)
    old_sink(mk(batches[0]), 0)
    old_sink(mk(batches[1]), 1)
    # reference rebuilt IN PLACE with stats; monitor restarts on top
    reduction.reference_histogram(mk(ref_x), ref_path)
    new_sink = reduction.drift_monitor_sink(spark, ref_path, out)
    new_sink(mk(batches[2]), 2)
    got = reduction.read_drift_monitor(spark, out)
    assert got.columns == ["dim", "psi", "t", "ks", "n_rows", "batch_id"]
    rows = {(r.batch_id, r.dim): r for r in got.collect()}
    assert len(rows) == 3 * d  # all three eras present: no replay loss
    assert all(rows[(b, i)].t is None for b in (0, 1) for i in range(d))
    assert all(
        rows[(b, i)].ks is None for b in (0, 1) for i in range(d)
    )
    assert abs(rows[(2, 1)].t) > 3.0  # the new era gates on t
    assert rows[(2, 0)].ks is not None  # ...and carries ks (round-15)
    assert rows[(0, 0)].psi is not None
    # replay of an OLD batch through the UPGRADED monitor: rewrites its
    # own partition (now with t), other partitions untouched
    new_sink(mk(batches[1]), 1)
    again = reduction.read_drift_monitor(spark, out)
    rows2 = {(r.batch_id, r.dim): r for r in again.collect()}
    assert len(rows2) == 3 * d
    assert all(rows2[(1, i)].t is not None for i in range(d))
    assert all(rows2[(0, i)].t is None for i in range(d))
    # an all-old-era table still reads with the stable 5-column shape
    out2 = str(tmp_path / "mon_old_only")
    shutil.rmtree(f"{ref_path}/stats")
    shutil.rmtree(f"{ref_path}/sample")
    reduction.drift_monitor_sink(spark, ref_path, out2)(mk(batches[0]), 0)
    old_only = reduction.read_drift_monitor(spark, out2)
    assert old_only.columns == [
        "dim", "psi", "t", "ks", "n_rows", "batch_id"
    ]
    assert all(r.t is None for r in old_only.collect())


def test_label_mi_sees_dependence_anova_cannot(spark):
    """The triad's division of labor, constructed exactly: a dimension
    whose classes share the SAME mean but differ in spread reads
    ANOVA F ≈ small (no mean separation) while binned MI fires; an
    independent dimension reads ≈ 0 on both."""
    import pandas as pd

    rng = np.random.RandomState(3)
    n = 400
    labels = np.repeat([0, 1], n // 2)
    # dim 0: independent of label. dim 1: equal means, sigma 0.2 vs 2.0
    d0 = rng.randn(n)
    d1 = np.where(labels == 0, 0.2 * rng.randn(n), 2.0 * rng.randn(n))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "label": labels.tolist(),
                "embedding": [list(v) for v in np.column_stack([d0, d1])],
            }
        )
    )
    f = {r.dim: r.f for r in reduction.label_anova_f(df).collect()}
    mi = {r.dim: r.mi for r in reduction.label_mi(df).collect()}
    # scale shift without mean shift: F stays small, MI separates hard
    assert f[1] < 4.0  # no mean separation for ANOVA to see
    assert mi[1] > 0.2
    assert mi[0] < 0.05  # independent dim: MI ~ 0
    assert mi[1] > 10 * max(mi[0], 1e-9)


def test_grouped_ols_outliers_exact_fit_flags_nothing(spark):
    """A group whose y is EXACTLY linear in x has zero residual scale —
    the operator must flag no rows (s=0 exclusion), not divide by
    zero."""
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(1, 12)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = reduction.grouped_ols_outliers(df, ["g"], "x", "y", z_gate=0.0)
    assert got.count() == 0


def test_grouped_ols_outliers_constant_x_group_flags_nothing(spark):
    """ADVICE r14: a group with MORE than 2 rows and constant x has
    vx = 0 — the fit is undefined, the operator must flag nothing, and
    under Spark 4 ANSI mode the cxy²/vx term must never be evaluated
    (the old guard only checked n > 2, so the CASE branch was taken
    and DIVIDE_BY_ZERO raised). A healthy sibling group still scores."""
    rows = [("const", 5.0, float(y)) for y in (1, 9, 4, 7)]  # vx = 0
    rows += [("ok", float(x), 2.0 * x) for x in range(1, 21)]
    rows.append(("ok", 3.0, 500.0))  # wildly off the line
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = reduction.grouped_ols_outliers(df, ["g"], "x", "y", z_gate=2.0)
    flagged = [(r.g, r.x, r.y) for r in got.collect()]  # must not raise
    assert ("ok", 3.0, 500.0) in flagged
    assert all(g == "ok" for g, _, _ in flagged)


def test_batch_drift_ttest_constant_dim_null_t(spark, tmp_path):
    """ADVICE r14: a dimension constant in BOTH the reference and the
    batch (e.g. a zero-padded dim) has v_ref = v_cur = 0, so the Welch
    denominator is 0 — t must be NULL ('no evidence'), not an ANSI
    DIVIDE_BY_ZERO that crash-loops drift_monitor_sink."""
    import pandas as pd

    rng = np.random.RandomState(5)
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"embedding": [row.tolist() for row in m]})
    )
    ref_x = np.column_stack([rng.randn(120), np.zeros(120)])
    cur_x = np.column_stack([rng.randn(80) + 1.5, np.zeros(80)])
    ref_path = str(tmp_path / "ref")
    reduction.reference_histogram(mk(ref_x), ref_path)
    t = {
        r.dim: r.t
        for r in reduction.batch_drift_ttest(
            spark, mk(cur_x), ref_path
        ).collect()
    }
    assert t[1] is None          # zero variance on both sides: NULL
    assert abs(t[0]) > 3.0       # the live dim still gates
    # the two-corpus variant shares the guard
    t2 = {
        r.dim: r.t
        for r in reduction.drift_ttest(mk(ref_x), mk(cur_x)).collect()
    }
    assert t2[1] is None and abs(t2[0]) > 3.0
    # and the streaming sink survives the constant dim end-to-end
    out = str(tmp_path / "mon")
    reduction.drift_monitor_sink(spark, ref_path, out)(mk(cur_x), 0)
    landed = {r.dim: r.t for r in spark.read.parquet(out).collect()}
    assert landed[1] is None and abs(landed[0]) > 3.0


def test_batch_drift_psi_longer_batch_vectors_warn(
    spark, emb, tmp_path, caplog
):
    """ADVICE r14: the (dim, bin) grid is built from reference dims
    only, so a batch emitting LONGER vectors (model change) must flag
    the geometry mismatch instead of silently not monitoring the extra
    dims. Monitored dims keep their values; the warning names both
    widths."""
    import logging as _logging

    ref = emb.filter(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "ref_hist")
    reduction.reference_histogram(ref, path)
    d_ref = len(emb.select("embedding").first().embedding)
    wide = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.concat(
            F.col("embedding"), F.array(F.lit(9.9), F.lit(9.9))
        ).alias("embedding")
    )
    with caplog.at_level(
        _logging.WARNING, logger="realtime_data_pipeline_spark.reduction"
    ):
        got = reduction.batch_drift_psi(spark, wide, path).collect()
    assert {r.dim for r in got} == set(range(d_ref))  # extras dropped...
    assert any(
        str(d_ref + 2) in m and str(d_ref) in m for m in caplog.messages
    )  # ...but loudly
    # a same-width batch stays quiet
    caplog.clear()
    with caplog.at_level(
        _logging.WARNING, logger="realtime_data_pipeline_spark.reduction"
    ):
        reduction.batch_drift_psi(
            spark, emb.filter(F.col("vec_id") % 2 == 1), path
        ).collect()
    assert not caplog.messages


@pytest.mark.slow
def test_batch_drift_ks_ref_null_fp_rate_at_default_m(spark, tmp_path):
    """Round-16 (verdict r15 item #7): the monitor's KS alert budget,
    MEASURED instead of assumed. batch_drift_ks_ref documents
    ~sqrt(1/m) reference-side subsampling scatter; the question is
    whether the asymptotic gate c(alpha)*sqrt((n1+n2)/(n1*n2)) still
    holds its false-positive budget when n1 is the m=512 DEFAULT
    persisted sample rather than the full reference. It does, because
    the threshold formula uses the SAMPLE size as n1 — the scatter is
    priced in. Deterministic null experiment (fixed seed): 15 drift-free
    batches x 6 dims = 90 KS draws against a 6000-row reference sampled
    at the default m; at alpha=0.01 the measured null flag rate must
    stay within 3x the nominal level (builder-measured 0.7% over 150
    draws; this pins the same generator at 90)."""
    import math

    import numpy as np
    import pandas as pd

    from realtime_data_pipeline_spark import reduction

    rng = np.random.RandomState(123)
    d, n_ref, n_b, n_batches = 6, 6000, 300, 15
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"embedding": [r.tolist() for r in m]})
    )
    p = str(tmp_path / "ref")
    reduction.reference_histogram(mk(rng.randn(n_ref, d)), p)  # default m
    m_rows = spark.read.parquet(f"{p}/sample").count()
    assert m_rows == 512 * d  # the documented default, pinned
    c = math.sqrt(-math.log(0.01 / 2) / 2)
    flags, total = 0, 0
    for _ in range(n_batches):
        for r in reduction.batch_drift_ks_ref(
            spark, mk(rng.randn(n_b, d)), p
        ).collect():
            thr = c * math.sqrt(
                (r.n_ref + r.n_cur) / (r.n_ref * r.n_cur)
            )
            assert r.n_ref == 512  # threshold built on the SAMPLE size
            total += 1
            flags += r.ks > thr
    assert total == n_batches * d
    assert flags / total <= 0.03, (flags, total)


def test_binned_woe_iv_hand_computed_and_guards(spark):
    """Round-16: WOE/IV against a hand-computed 2-bin example, plus
    the total-function guards — eps smoothing keeps empty-class bins
    finite, a single-class label yields NULL woe/iv (not a crash),
    NULL features/labels are excluded, bad geometry refuses."""
    import math

    import pytest as _pytest

    from realtime_data_pipeline_spark import reduction

    rows = [
        # bin 0 (x in [0,5)): 3 pos, 1 neg ; bin 1 ([5,10)): 1 pos, 5 neg
        (1.0, 1), (2.0, 1), (3.0, 1), (4.0, 0),
        (6.0, 1), (7.0, 0), (7.5, 0), (8.0, 0), (9.0, 0), (9.5, 0),
        (None, 1), (5.0, None),  # excluded
    ]
    df = spark.createDataFrame(rows, "x double, y int")
    got = {
        r.bin: r
        for r in reduction.binned_woe_iv(
            df, "x", "y", n_bins=2, lo=0.0, hi=10.0
        ).collect()
    }
    # note the (5.0, None) row is excluded, so bin 1 has 6 rows
    p_tot, n_tot, k, eps = 4.0, 6.0, 2, 0.5
    exp = {}
    iv = 0.0
    for b, (pos, neg) in {0: (3.0, 1.0), 1: (1.0, 5.0)}.items():
        pp = (pos + eps) / (p_tot + eps * k)
        pn = (neg + eps) / (n_tot + eps * k)
        w = math.log(pp / pn)
        exp[b] = w
        iv += (pp - pn) * w
    for b in (0, 1):
        assert abs(got[b].woe - exp[b]) < 1e-12
        assert abs(got[b].iv - iv) < 1e-12
    assert got[0].n == 4 and got[0].n_pos == 3 and got[0].n_neg == 1
    assert got[1].n == 6 and got[1].n_pos == 1 and got[1].n_neg == 5
    assert got[0].bin_lo == 0.0 and got[1].bin_lo == 5.0
    # out-of-range clamps to edge bins
    clamped = reduction.binned_woe_iv(
        spark.createDataFrame(
            [(-3.0, 1), (99.0, 0)], "x double, y int"
        ),
        "x", "y", n_bins=2, lo=0.0, hi=10.0,
    ).collect()
    assert {r.bin for r in clamped} == {0, 1}
    # single-class label: NULL woe/iv, no division crash (ANSI)
    mono = reduction.binned_woe_iv(
        spark.createDataFrame(
            [(1.0, 1), (6.0, 1)], "x double, y int"
        ),
        "x", "y", n_bins=2, lo=0.0, hi=10.0,
    ).collect()
    assert all(r.woe is None and r.iv is None for r in mono)
    with _pytest.raises(ValueError, match="lo < hi"):
        reduction.binned_woe_iv(df, "x", "y", n_bins=2, lo=1.0, hi=1.0)
    with _pytest.raises(ValueError, match="n_bins >= 1"):
        reduction.binned_woe_iv(df, "x", "y", n_bins=0, lo=0.0, hi=1.0)


def test_grouped_js_divergence_identity_and_hand_computed(spark):
    """Round-16: JS divergence properties — a group whose mix equals
    the global mix reads exactly 0; a fully disjoint group reads
    high; hand-computed two-category example matches; bounded [0,1]
    bits; absent-cell algebra equals the explicit-grid computation."""
    import math

    from realtime_data_pipeline_spark import reduction

    # one group == global mix (identical distribution) -> js 0
    rows = [("a", "en")] * 6 + [("a", "fr")] * 2
    df = spark.createDataFrame(rows, "source string, lang string")
    got = reduction.grouped_js_divergence(df, ["source"], "lang").collect()
    assert len(got) == 1 and abs(got[0].js_bits) < 1e-12

    # two disjoint single-lang sources, 50/50 global
    rows = [("a", "en")] * 5 + [("b", "fr")] * 5
    got = {
        r.source: r
        for r in reduction.grouped_js_divergence(
            spark.createDataFrame(rows, "source string, lang string"),
            ["source"], "lang",
        ).collect()
    }
    # hand: p=(1,0), q=(.5,.5), m=(.75,.25);
    # js = .5*[1*ln(1/.75)] + .5*[.5*ln(.5/.75) + .5*ln(.5/.25)] nats
    exp = 0.5 * (1.0 * math.log(1 / 0.75)) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    )
    for s in ("a", "b"):
        assert abs(got[s].js_bits - exp / math.log(2)) < 1e-12
        assert 0.0 <= got[s].js_bits <= 1.0
        assert got[s].n == 5
