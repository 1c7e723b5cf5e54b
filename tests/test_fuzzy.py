"""Fuzzy entity-matching tests: the symmetric-delete blocking must be
COMPLETE (find exactly the brute-force pair set) at d=1 and d=2 across
substitutions, insertions and deletions, and the plan must contain no
cross product."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import fuzzy


def _brute_pairs(spark, rows, max_dist):
    df = spark.createDataFrame(rows, "id long, name string")
    a = df.select(F.col("id").alias("id_a"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("id_b"), F.col("name").alias("nb"))
    return {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("na", "nb") <= max_dist)
        .collect()
    }


NAMES = [
    (1, "acme widgets ltd"),
    (2, "acme widgets ltd"),      # exact dup -> dist 0
    (3, "acme widgets itd"),      # substitution
    (4, "acme widgets ltd."),     # insertion
    (5, "acme widgets lt"),       # deletion
    (6, "acme wdigets ltd"),      # transposition = 2 edits
    (7, "emca widgets ltd"),      # 3+ edits from most others
    (8, "zeta plumbing co"),      # unrelated
    (9, ""),                      # empty string
    (10, "a"),                    # single char
    (11, "b"),                    # dist 1 from "a"
    (12, "ab"),                   # dist 1 from both "a" and "b"
]


@pytest.mark.parametrize("d", [1, 2])
def test_self_pairs_equal_brute_force(spark, d):
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy.fuzzy_self_pairs(
            spark.createDataFrame(NAMES, "id long, name string"),
            "id",
            "name",
            max_dist=d,
        ).collect()
    }
    assert got == _brute_pairs(spark, NAMES, d)
    # sanity on content, not just set-equality with brute force
    if d == 1:
        assert (1, 2) in got and (1, 3) in got and (1, 4) in got
        assert (1, 5) in got and (10, 11) in got
        assert (1, 6) not in got  # transposition is 2 edits
    else:
        assert (1, 6) in got and (3, 4) in got


def test_fuzzy_join_cross_table(spark):
    left = spark.createDataFrame(
        [(1, "jon smith"), (2, "mary jones")], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(10, "john smith"), (11, "jon smith"), (12, "bob stone")],
        "rid long, rname string",
    )
    got = {
        (r.lid, r.rid, r.dist)
        for r in fuzzy.fuzzy_join(
            left, right, "lid", "rid", "lname", "rname", max_dist=1
        ).collect()
    }
    assert got == {(1, 10, 1), (1, 11, 0)}


def test_same_column_names_dont_collide(spark):
    t = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, name string")
    out = fuzzy.fuzzy_join(t, t, "id", "id", "name", "name", max_dist=1)
    got = {(r["id"], r["__r_id"], r["dist"]) for r in out.collect()}
    assert (1, 2, 1) in got and (1, 1, 0) in got


def test_null_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "abc")], "id long, name string"
    )
    assert fuzzy.fuzzy_self_pairs(df, "id", "name", 1).count() == 0
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy.deletion_variants(F.lit("x"), 3)


def test_plan_has_no_cross_product(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    plan = (
        fuzzy.fuzzy_self_pairs(df, "id", "name", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
