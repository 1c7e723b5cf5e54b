"""DQ engine semantics: synthetic violation rows per rule, count + policy
assertions — port of the reference gate semantics
(``spark_jobs/dq_checks.py:50-77,119-120``), SURVEY.md §5 item 3."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import dq


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        # (fare, distance, passengers)
        (10.0, 2.0, 1),  # clean
        (-5.0, 3.0, 2),  # neg fare
        (None, 1.0, 1),  # null fare
        (7.0, 500.0, 4),  # long distance
        (8.0, 2.5, 0),  # bad passengers
        (9.0, 1.0, None),  # null passengers
    ]
    return spark.createDataFrame(
        rows, "fare_amount double, trip_distance double, passenger_count int"
    )


def rules():
    return [
        dq.Rule(
            "neg_or_null_fare",
            (F.col("fare_amount") < 0) | F.col("fare_amount").isNull(),
        ),
        dq.Rule("long_distance", F.col("trip_distance") > 200, threshold=1),
        dq.Rule(
            "bad_passengers",
            (F.col("passenger_count") <= 0) | F.col("passenger_count").isNull(),
        ),
    ]


def test_single_pass_counts(spark, toy):
    row = dq.violation_counts_df(toy, rules()).collect()[0]
    assert row["total_rows"] == 6
    assert row["neg_or_null_fare"] == 2
    assert row["long_distance"] == 1
    assert row["bad_passengers"] == 2


def test_policy_thresholds(spark, toy):
    report = dq.evaluate(toy, rules())
    # long_distance: 1 violation <= threshold 1 -> passes; others fail.
    assert report.results["long_distance"]["passed"]
    assert not report.results["neg_or_null_fare"]["passed"]
    assert not report.passed


def test_gate_raises_exit_2(spark, toy):
    with pytest.raises(dq.DQCheckFailed) as exc:
        dq.evaluate(toy, rules(), raise_on_fail=True)
    assert exc.value.code == 2
    assert "neg_or_null_fare" in exc.value.failed_rules


def test_warn_only_does_not_raise(spark, toy):
    report = dq.evaluate(toy, rules(), warn_only=True, raise_on_fail=True)
    assert not report.passed  # still reported


def test_clean_quarantine_split(spark, toy):
    clean, bad = dq.split_clean_violations(toy, rules())
    assert clean.count() == 1
    assert bad.count() == 5


def test_split_partitions_input_with_null_predicates(spark):
    """Rows where a predicate evaluates to NULL (not True/False) must land in
    exactly one side — clean — matching violation_counts_df, which counts a
    NULL predicate as non-violating. Regression for the three-valued-logic
    row-drop bug."""
    df = spark.createDataFrame(
        [(None, 1.0), (300.0, 2.0), (50.0, None)],
        "trip_distance double, fare_amount double",
    )
    null_unaware = [dq.Rule("long_distance", F.col("trip_distance") > 200)]
    clean, bad = dq.split_clean_violations(df, null_unaware)
    assert bad.count() == 1
    assert clean.count() == 2  # NULL-distance row is clean, not dropped
    counts = dq.violation_counts_df(df, null_unaware).collect()[0]
    assert counts["long_distance"] == bad.count()


def test_report_artifact(tmp_path, spark, toy):
    report = dq.evaluate(toy, rules(), warn_only=True)
    path = report.write_json(tmp_path)
    data = json.loads(path.read_text())
    assert data["total_rows"] == 6
    assert data["rules"]["neg_or_null_fare"]["violations"] == 2
    assert data["warn_only"] is True
