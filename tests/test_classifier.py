"""Trained quality classifier (classifier.py): featurization geometry,
parity with the numpy reference GD, separable-data accuracy, partition-
layout stability, bounded-gradient shape, and the Arrow-not-row UDF
plan."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import classifier

DIM = 256


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def labeled(spark):
    """Separable two-class corpus: class 1 repeats 'good'-family tokens,
    class 0 'junk'-family tokens, with shared filler both sides."""
    rows = []
    for i in range(120):
        rows.append((f"good quality prose sample {i % 7} the and", 1))
        rows.append((f"junk spam noise blob {i % 5} the and", 0))
    pdf = pd.DataFrame(rows, columns=["text", "y"])
    return (
        spark.createDataFrame(pdf)
        .withColumn("x", classifier.hash_features(F.col("text"), DIM))
        .persist()
    )


def test_hash_features_bag_semantics_and_nulls(spark):
    pdf = pd.DataFrame({"text": ["a a b", "", None]})
    df = spark.createDataFrame(pdf).withColumn(
        "x", classifier.hash_features(F.col("text"), DIM)
    )
    got = [r.x for r in df.collect()]
    assert len(got[0]) == 3 and got[0][0] == got[0][1] != got[0][2]
    assert all(0 <= i < DIM for i in got[0])
    assert got[1] == [] or len(got[1]) <= 1  # split("") quirk tolerated
    assert got[2] == []  # NULL text -> empty bag, not NULL


def test_featurization_stays_jvm_side(labeled):
    plan = plan_str(labeled.select("x"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_train_matches_numpy_reference(labeled):
    model = classifier.logreg_train(
        labeled, "x", "y", dim=DIM, iters=15, lr=0.5, l2=1e-4
    )
    rows = labeled.select("x", "y").collect()
    w_ref, b_ref = classifier.numpy_logreg_reference(
        [list(r.x) for r in rows], [float(r.y) for r in rows],
        dim=DIM, iters=15, lr=0.5, l2=1e-4,
    )
    np.testing.assert_allclose(model["w"], w_ref, atol=1e-9)
    assert abs(model["bias"] - b_ref) < 1e-9


@pytest.mark.slow
def test_separable_accuracy_and_probability_shape(labeled):
    model = classifier.logreg_train(labeled, "x", "y", dim=DIM, iters=30)
    scored = classifier.logreg_score(labeled, model, "x")
    agg = scored.select(
        F.avg(
            ((F.col("score") > 0.5).cast("int") == F.col("y")).cast("double")
        ).alias("acc"),
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
    ).first()
    assert agg.acc >= 0.99, agg
    assert 0.0 <= agg.lo <= agg.hi <= 1.0


@pytest.mark.slow
def test_training_invariant_to_partition_layout(labeled):
    kw = dict(dim=DIM, iters=8, lr=0.5, l2=1e-4)
    a = classifier.logreg_train(labeled.coalesce(1), "x", "y", **kw)
    b = classifier.logreg_train(labeled.repartition(13), "x", "y", **kw)
    np.testing.assert_allclose(a["w"], b["w"], atol=1e-9)
    assert abs(a["bias"] - b["bias"]) < 1e-9


def test_gradient_shuffle_is_geometry_bounded(labeled):
    """The per-iteration reduce produces at most dim+1 groups no matter
    the corpus size — the scale contract the docstring promises."""
    distinct = (
        labeled.select(F.explode("x").alias("i")).distinct().count()
    )
    assert distinct <= DIM


def test_scoring_is_arrow_batched_not_row_at_a_time(labeled):
    model = classifier.logreg_train(labeled, "x", "y", dim=DIM, iters=2)
    plan = plan_str(classifier.logreg_score(labeled, model, "x"))
    assert "ArrowEvalPython" in plan  # pandas UDF, Arrow transfer
    assert "BatchEvalPython" not in plan  # never pickled row-at-a-time
    assert "Exchange" not in plan  # scoring is map-only


def test_empty_input_raises(spark):
    empty = spark.createDataFrame(
        pd.DataFrame({"x": pd.Series([], dtype=object), "y": []}),
        "x array<bigint>, y int",
    )
    with pytest.raises(ValueError, match="empty input"):
        classifier.logreg_train(empty, "x", "y", dim=8, iters=1)


@pytest.mark.slow
def test_face_runs_and_beats_chance(spark, sf_dir):
    from realtime_data_pipeline_spark.queries.llm import (
        docs_quality_classifier,
    )

    out = docs_quality_classifier(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert {"doc_id", "weak_label", "score", "pred"} <= set(out.columns)
    acc = sum(1 for r in rows if r.pred == r.weak_label) / len(rows)
    assert acc >= 0.9, acc  # trained on its own weak labels: must fit


def test_logreg_model_roundtrip_scores_identically(spark, labeled, tmp_path):
    model = classifier.logreg_train(labeled, "x", "y", dim=DIM, iters=5)
    path = str(tmp_path / "lr_model")
    classifier.save_logreg(spark, model, path)
    back = classifier.load_logreg(spark, path)
    assert np.array_equal(back["w"], model["w"])
    assert back["bias"] == model["bias"]
    a = classifier.logreg_score(labeled, model, "x").select("score").collect()
    b = classifier.logreg_score(labeled, back, "x").select("score").collect()
    assert [r.score for r in a] == [r.score for r in b]


@pytest.fixture(scope="module")
def labeled3(spark):
    """Three separable classes sharing filler tokens."""
    rows = []
    for i in range(80):
        rows.append((f"alpha prose quality text {i % 7} the and", 0))
        rows.append((f"beta spam noise junk {i % 5} the and", 1))
        rows.append((f"gamma code table data {i % 3} the and", 2))
    pdf = pd.DataFrame(rows, columns=["text", "y"])
    return (
        spark.createDataFrame(pdf)
        .withColumn("x", classifier.hash_features(F.col("text"), DIM))
        .persist()
    )


@pytest.mark.slow
def test_softmax_matches_numpy_reference(labeled3):
    model = classifier.softmax_train(
        labeled3, "x", "y", dim=DIM, n_classes=3, iters=10, lr=0.5, l2=1e-4
    )
    rows = labeled3.select("x", "y").collect()
    W_ref, b_ref = classifier.numpy_softmax_reference(
        [list(r.x) for r in rows], [int(r.y) for r in rows],
        dim=DIM, n_classes=3, iters=10, lr=0.5, l2=1e-4,
    )
    np.testing.assert_allclose(model["W"], W_ref, atol=1e-9)
    np.testing.assert_allclose(model["bias"], b_ref, atol=1e-9)


@pytest.mark.slow
def test_softmax_separable_accuracy_and_valid_probs(labeled3):
    model = classifier.softmax_train(
        labeled3, "x", "y", dim=DIM, n_classes=3, iters=30
    )
    scored = classifier.softmax_score(labeled3, model, "x")
    agg = scored.select(
        F.avg((F.col("pred") == F.col("y")).cast("double")).alias("acc"),
        F.min(F.aggregate("probs", F.lit(0.0), lambda a, x: a + x)).alias(
            "psum_lo"
        ),
        F.max(F.aggregate("probs", F.lit(0.0), lambda a, x: a + x)).alias(
            "psum_hi"
        ),
    ).first()
    assert agg.acc >= 0.99, agg
    assert abs(agg.psum_lo - 1.0) < 1e-9 and abs(agg.psum_hi - 1.0) < 1e-9


def test_softmax_layout_invariance(labeled3):
    kw = dict(dim=DIM, n_classes=3, iters=5, lr=0.5, l2=1e-4)
    a = classifier.softmax_train(labeled3.coalesce(1), "x", "y", **kw)
    b = classifier.softmax_train(labeled3.repartition(11), "x", "y", **kw)
    np.testing.assert_allclose(a["W"], b["W"], atol=1e-9)
    np.testing.assert_allclose(a["bias"], b["bias"], atol=1e-9)


@pytest.mark.slow
def test_multiclass_face_fits_bands(spark, sf_dir):
    from realtime_data_pipeline_spark.queries.llm import (
        docs_quality_band_multiclass,
    )

    out = docs_quality_band_multiclass(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    acc = sum(1 for r in rows if r.pred == r.weak_label) / len(rows)
    assert acc >= 0.9, acc
    assert all(0.0 <= r.p_pred <= 1.0 for r in rows)


@pytest.mark.slow
def test_streaming_curation_stage_with_trained_gate(spark, labeled):
    """curation_stage(quality_model=...): the trained gate drops junk
    docs from a (micro-)batch map-only — the streaming sibling of
    `assemble --quality-model`."""
    from realtime_data_pipeline_spark import streaming

    model = classifier.logreg_train(labeled, "x", "y", dim=DIM, iters=30)
    stage = streaming.curation_stage(
        text_col="text", redact=False, quality_model=model,
        quality_min_score=0.5,
    )
    batch = labeled.select("text", "y")
    kept = stage(batch)
    assert kept.filter(F.col("y") == 0).count() == 0  # junk gone
    assert kept.filter(F.col("y") == 1).count() == batch.filter(
        F.col("y") == 1
    ).count()  # every good doc survives
    assert "y" in kept.columns and "text" in kept.columns  # schema kept


def test_isotonic_calibration_properties(spark):
    """PAVA over binned scores: output monotone nondecreasing, total
    weighted mean preserved, Brier score never worse than raw on
    monotone-noisy synthetic data, and pure-JVM application."""
    import contextlib
    import io

    rng = np.random.RandomState(7)
    n = 4000
    s = rng.uniform(0, 1, n)
    # true P(y|s) monotone but miscalibrated: p = s^2
    y = (rng.uniform(0, 1, n) < s**2).astype(int)
    df = spark.createDataFrame(
        pd.DataFrame({"score": s, "y": y})
    ).repartition(8)
    calib = classifier.isotonic_calibrate(df, "score", "y", n_bins=100)
    # step function is nondecreasing
    assert calib["values"] == sorted(calib["values"])
    assert calib["edges"] == sorted(calib["edges"])
    out = classifier.calibrated_score(df, calib, "score")
    rows = out.select("score", "y", "calibrated").collect()
    # weighted mean preserved (PAVA conserves the total)
    mean_cal = sum(r.calibrated for r in rows) / len(rows)
    mean_y = sum(r.y for r in rows) / len(rows)
    assert abs(mean_cal - mean_y) < 1e-6
    # calibrated Brier beats raw (p = s is miscalibrated vs s^2 truth)
    brier_raw = sum((r.score - r.y) ** 2 for r in rows) / len(rows)
    brier_cal = sum((r.calibrated - r.y) ** 2 for r in rows) / len(rows)
    assert brier_cal < brier_raw
    # application is JVM-only, map-only
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan or "repartition" in plan.lower()


def test_isotonic_monotone_input_is_near_identity(spark):
    """Already-calibrated monotone bin means survive PAVA unpooled:
    every observed bin keeps its own step."""
    rows = [(i / 10 + 0.05, 1 if j < i else 0)
            for i in range(10) for j in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["score", "y"]))
    calib = classifier.isotonic_calibrate(df, "score", "y", n_bins=10)
    assert len(calib["edges"]) == 10  # no pooling needed
    np.testing.assert_allclose(calib["values"], [i / 10 for i in range(10)])
