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


@pytest.mark.slow
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


@pytest.mark.slow
def test_fuzzy_ingest_batches_dedup_across_batches_and_compact(
    spark, tmp_path
):
    """fuzzy_ingest_batch: in-batch fuzzy dedup, cross-batch drop via the
    persisted variant index (exact Levenshtein verify), NULL keys pass
    through unindexed, replay of a committed batch is a no-op, and
    compaction folds both subtrees without changing probe behavior."""
    import os

    from realtime_data_pipeline_spark import streaming

    schema = "id long, name string"
    idx = str(tmp_path / "fuzzy_index")
    silver = str(tmp_path / "fuzzy_silver")

    def ingest(rows, bid):
        streaming.fuzzy_ingest_batch(
            spark.createDataFrame(rows, schema), bid, idx, silver,
            "id", "name", max_dist=1,
        )

    def silver_ids():
        return {r.id for r in spark.read.parquet(silver).collect()}

    # batch 0: in-batch pair (10, 11) one edit apart -> smaller id wins
    ingest([(10, "acme ltd"), (11, "acme ltd."), (12, "zeta co")], 0)
    assert silver_ids() == {10, 12}

    # batch 1: 13 is 1 edit from indexed "acme ltd" -> dup; 14 novel;
    # 15 NULL key passes through
    ingest([(13, "acme ltd"), (14, "omega inc"), (15, None)], 1)
    assert silver_ids() == {10, 12, 14, 15}

    # replay of batch 1: identical fresh set, no double-ingest
    ingest([(13, "acme ltd"), (14, "omega inc"), (15, None)], 1)
    assert silver_ids() == {10, 12, 14, 15}

    # compaction folds vars/ and keys/ into batch_id=-1
    m = streaming.compact_fuzzy_index(spark, idx)
    assert m["batch_partitions_after"] == 2  # one per subtree
    for sub in ("vars", "keys"):
        assert [
            d
            for d in os.listdir(os.path.join(idx, sub))
            if d.startswith("batch_id=")
        ] == ["batch_id=-1"]

    # post-compaction probe still drops a near-match of folded content
    # and admits a novel entity
    ingest([(16, "zeta com"), (17, "brand new name")], 2)
    assert silver_ids() == {10, 12, 14, 15, 17}


@pytest.mark.slow
def test_fuzzy_ingest_stream_end_to_end(spark, tmp_path):
    """fuzzy_ingest_stream: the foreachBatch wrapper routes file-stream
    micro-batches through the same exactly-once entity resolution."""
    from realtime_data_pipeline_spark import streaming

    schema = "id long, name string"
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    spark.createDataFrame(
        [(1, "acme ltd"), (2, "zeta co")], schema
    ).coalesce(1).write.parquet(str(inbox / "b0"))
    spark.createDataFrame(
        [(3, "acme ltd."), (4, "omega inc")], schema
    ).coalesce(1).write.parquet(str(inbox / "b1"))

    # file streams list files, not directories — feed the parquet files
    import glob
    import os
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(
        sorted(glob.glob(str(inbox / "b*" / "*.parquet")))
    ):
        dst = str(flat / f"{i}.parquet")
        shutil.copy(f, dst)
        # the file source orders micro-batches by mtime; copies land
        # with near-identical timestamps, so pin the intended order
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    q = streaming.fuzzy_ingest_stream(
        streaming.read_file_stream(
            spark, str(flat), schema, fmt="parquet",
            max_files_per_trigger=1,
        ),
        str(tmp_path / "idx"),
        str(tmp_path / "silver"),
        checkpoint=str(tmp_path / "ckpt"),
        id_col="id",
        key_col="name",
        max_dist=1,
    )
    assert q.awaitTermination(120)
    got = {
        r.id for r in spark.read.parquet(str(tmp_path / "silver")).collect()
    }
    # "acme ltd" (1) and "acme ltd." (3) are 1 edit apart: whichever
    # batch lands second loses to the index (or the in-batch dedup if
    # they arrive together) — exactly one of the pair survives, and the
    # two unrelated names always do
    assert {2, 4} <= got and len(got & {1, 3}) == 1 and len(got) == 3


def test_cli_link_self_and_cross(spark, tmp_path, capsys):
    """cli link: self-pairs by default, cross-table with --right; output
    parquet holds the verified pairs with distances."""
    from realtime_data_pipeline_spark import cli

    left = str(tmp_path / "left")
    spark.createDataFrame(
        [(1, "jon smith"), (2, "mary jones")], "id long, name string"
    ).write.parquet(left)
    right = str(tmp_path / "right")
    spark.createDataFrame(
        [(10, "john smith"), (11, "bob stone")], "id long, name string"
    ).write.parquet(right)

    out = str(tmp_path / "self_out")
    assert cli.main(["link", "--left", left, "--out", out]) == 0
    assert spark.read.parquet(out).count() == 0  # no self near-pairs

    out2 = str(tmp_path / "cross_out")
    assert cli.main(
        ["link", "--left", left, "--right", right, "--out", out2,
         "--dist", "1"]
    ) == 0
    got = {
        (r["id"], r["__r_id"], r["dist"])
        for r in spark.read.parquet(out2).collect()
    }
    assert got == {(1, 10, 1)}


def test_randomized_edit_completeness(spark):
    """Property check of the completeness claim: for 150 seeded random
    (base, mutated) pairs with 0-4 random character edits
    (insert/delete/substitute), fuzzy_self_pairs at d=2 finds a pair
    exactly when true Levenshtein <= 2 — no false negatives from the
    blocking, no false positives from hash collisions."""
    import random

    rng = random.Random(20260815)
    alpha = "abcdefghij"

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(
                    prev[j] + 1, cur[-1] + 1,
                    prev[j - 1] + (ca != cb),
                ))
            prev = cur
        return prev[-1]

    rows = []
    truth = set()
    for case in range(150):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 14)))
        s = base
        for _ in range(rng.randint(0, 4)):
            op = rng.choice("ids")
            pos = rng.randint(0, max(len(s) - 1, 0))
            if op == "i":
                s = s[:pos] + rng.choice(alpha) + s[pos:]
            elif op == "d" and s:
                s = s[:pos] + s[pos + 1:]
            else:
                s = s[:pos] + rng.choice(alpha) + s[pos + 1:] if s else s
        tag = f"{case:03d}x"
        a_id, b_id = 2 * case, 2 * case + 1
        rows += [(a_id, tag + base), (b_id, tag + s)]

    # ground truth by FULL brute force over all 300 strings — random
    # cases can land within distance 2 of each other across case
    # boundaries too, and those pairs are just as real
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if lev(rows[i][1], rows[j][1]) <= 2:
                truth.add((rows[i][0], rows[j][0]))

    got = {
        (r.id_a, r.id_b)
        for r in fuzzy.fuzzy_self_pairs(
            spark.createDataFrame(rows, "id long, name string"),
            "id",
            "name",
            max_dist=2,
        ).collect()
    }
    assert got == truth, (
        f"missing={sorted(truth - got)[:5]} extra={sorted(got - truth)[:5]}"
    )
