"""Versioned zones (versioned.py): snapshot isolation, time travel,
append/overwrite lineage, non-destructive rollback, optimistic
concurrency, and vacuum retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import versioned


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_append_and_overwrite_lineage(spark, tmp_path):
    root = str(tmp_path / "zone")
    m0 = versioned.commit_version(_df(spark, 0, 100), root, mode="append")
    m1 = versioned.commit_version(_df(spark, 100, 150), root, mode="append")
    m2 = versioned.commit_version(_df(spark, 0, 10), root, mode="overwrite")
    assert (m0["version"], m1["version"], m2["version"]) == (0, 1, 2)
    assert (m0["rows"], m1["rows"], m2["rows"]) == (100, 50, 10)

    assert versioned.read_version(spark, root, 0).count() == 100
    assert versioned.read_version(spark, root, 1).count() == 150  # time travel
    assert versioned.read_version(spark, root).count() == 10  # latest


def test_snapshot_isolation_under_concurrent_overwrite(spark, tmp_path):
    """A DataFrame resolved against version N keeps reading version N's
    exact files even after a later overwrite commit — the property a
    plain parquet root overwrite violates."""
    root = str(tmp_path / "zone_iso")
    versioned.commit_version(_df(spark, 0, 100), root)
    pinned = versioned.read_version(spark, root, 0)
    versioned.commit_version(_df(spark, 0, 5), root, mode="overwrite")
    assert pinned.count() == 100
    assert versioned.read_version(spark, root).count() == 5


def test_rollback_is_non_destructive(spark, tmp_path):
    root = str(tmp_path / "zone_rb")
    versioned.commit_version(_df(spark, 0, 100), root)
    versioned.commit_version(_df(spark, 0, 3), root, mode="overwrite")  # bad load
    out = versioned.rollback(root, to_version=0)
    assert out == {"version": 2, "restored": 0}
    assert versioned.read_version(spark, root).count() == 100
    # the bad version stays inspectable until vacuum
    assert versioned.read_version(spark, root, 1).count() == 3


def test_optimistic_concurrency_retries_past_taken_version(spark, tmp_path):
    """Simulate losing the O_EXCL race: pre-create the manifest the
    commit would claim; the commit must retry onto the next version and
    append on top of the interloper's file list."""
    root = str(tmp_path / "zone_occ")
    versioned.commit_version(_df(spark, 0, 10), root)
    # interloper claims v1 with v0's files (a concurrent rollback/no-op)
    import json

    files = versioned._read_manifest(root, 0)["files"]
    with open(versioned._manifest_path(root, 1), "w") as f:
        json.dump({"version": 1, "mode": "append", "files": files, "rows_added": 0}, f)

    m = versioned.commit_version(_df(spark, 10, 20), root, mode="append")
    assert m["version"] == 2
    assert versioned.read_version(spark, root).count() == 20


def test_vacuum_drops_unreferenced_files_keeps_live_snapshots(spark, tmp_path):
    root = str(tmp_path / "zone_vac")
    versioned.commit_version(_df(spark, 0, 100), root)
    versioned.commit_version(_df(spark, 0, 50), root, mode="overwrite")
    versioned.commit_version(_df(spark, 0, 25), root, mode="overwrite")

    out = versioned.vacuum(root, keep_last=2, min_age_s=0)
    assert out["dropped_manifests"] == 1
    assert out["dropped_files"] > 0
    assert versioned.versions(root) == [1, 2]
    # kept snapshots read byte-identically after vacuum
    assert versioned.read_version(spark, root, 1).count() == 50
    assert versioned.read_version(spark, root, 2).count() == 25
    with pytest.raises(ValueError, match="not in"):
        versioned.read_version(spark, root, 0)
    # v0's commit dir is physically gone
    data = os.path.join(root, "data")
    remaining = {
        os.path.join("data", d, f)
        for d in os.listdir(data)
        for f in os.listdir(os.path.join(data, d))
        if f.endswith(".parquet")
    }
    referenced = set(versioned._read_manifest(root, 1)["files"]) | set(
        versioned._read_manifest(root, 2)["files"]
    )
    assert remaining == referenced


def test_read_missing_version_raises(spark, tmp_path):
    root = str(tmp_path / "zone_missing")
    with pytest.raises(ValueError, match="no committed versions"):
        versioned.read_version(spark, root)


def test_streaming_batches_commit_as_versions_exactly_once(spark, tmp_path):
    """Each micro-batch commits as one snapshot; a forced replay of the
    same batch id (the streaming-restart delivery contract) publishes
    nothing twice."""
    import os

    import glob
    import shutil

    root = str(tmp_path / "zone_stream")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for i in range(3):
        staging = tmp_path / f"stage_{i}"
        _df(spark, i * 10, (i + 1) * 10).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        shutil.move(part, inbox / f"f{i}.parquet")
        os.utime(inbox / f"f{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    schema = _df(spark, 0, 1).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(inbox))
        .writeStream.foreachBatch(versioned.versioned_batch_writer(root))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert len(versioned.versions(root)) == 3
    assert versioned.read_version(spark, root).count() == 30

    # forced replay of an already-committed batch id: marker dedups it
    replay = versioned.commit_version(
        _df(spark, 0, 10), root, batch_tag="stream-0"
    )
    assert replay["skipped_replay"] is True
    assert len(versioned.versions(root)) == 3
    assert versioned.read_version(spark, root).count() == 30


def test_append_rejects_schema_drift(spark, tmp_path):
    """A mixed-schema snapshot would silently read through one sampled
    footer and drop the other files' columns — the append must refuse
    instead; overwrite evolves the schema cleanly."""
    root = str(tmp_path / "zone_schema")
    versioned.commit_version(_df(spark, 0, 10), root)
    drifted = _df(spark, 10, 20).withColumn("extra", F.lit("x"))
    with pytest.raises(ValueError, match="schema mismatch"):
        versioned.commit_version(drifted, root, mode="append")
    m = versioned.commit_version(drifted, root, mode="overwrite")
    assert m["version"] == 1
    assert "extra" in versioned.read_version(spark, root).columns


def test_manifest_claim_is_atomic_with_content(tmp_path):
    """A claimed manifest is never observable empty/partial: the claim
    is a hard-link of a fully-written temp file, and a pre-existing
    EMPTY v<N>.json (the crashed-between-create-and-write artifact the
    old O_EXCL spelling could leave) loses the claim cleanly instead of
    wedging readers."""
    target = str(tmp_path / "v0000000001.json")
    assert versioned._atomic_claim(target, '{"ok": 1}') is True
    import json

    with open(target) as f:
        assert json.load(f) == {"ok": 1}
    assert versioned._atomic_claim(target, '{"ok": 2}') is False
    with open(target) as f:
        assert json.load(f) == {"ok": 1}  # loser never mutates the winner
    assert not [p for p in tmp_path.iterdir() if p.name.endswith(".tmp")]


def test_vacuum_age_guard_spares_inflight_commit_files(spark, tmp_path):
    """An unreferenced data file younger than min_age_s may belong to a
    commit whose manifest hasn't landed — vacuum must skip it."""
    import os

    root = str(tmp_path / "zone_age")
    versioned.commit_version(_df(spark, 0, 10), root)
    versioned.commit_version(_df(spark, 0, 5), root, mode="overwrite")
    # make v0's (unreferenced after keep_last=1) files LOOK in-flight
    out = versioned.vacuum(root, keep_last=1, min_age_s=3600)
    assert out["dropped_files"] == 0 and out["skipped_young_files"] > 0
    # aged out -> collected
    out = versioned.vacuum(root, keep_last=1, min_age_s=0)
    assert out["dropped_files"] > 0
    assert versioned.read_version(spark, root).count() == 5


def test_vacuum_refuses_zero_retention(spark, tmp_path):
    root = str(tmp_path / "zone_keep0")
    versioned.commit_version(_df(spark, 0, 10), root)
    with pytest.raises(ValueError, match="keep_last"):
        versioned.vacuum(root, keep_last=0)


def test_rollback_carries_schema_keeping_append_guard_armed(spark, tmp_path):
    root = str(tmp_path / "zone_rbschema")
    versioned.commit_version(_df(spark, 0, 10), root)
    versioned.commit_version(_df(spark, 0, 5), root, mode="overwrite")
    versioned.rollback(root, to_version=0)
    drifted = _df(spark, 10, 20).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="schema mismatch"):
        versioned.commit_version(drifted, root, mode="append")


def test_empty_snapshot_reads_with_recorded_schema(spark, tmp_path):
    root = str(tmp_path / "zone_empty")
    versioned.commit_version(_df(spark, 0, 0), root)  # zero rows
    df = versioned.read_version(spark, root)
    assert df.count() == 0
    assert df.columns == ["id", "v"]


def test_vacuum_drops_stale_batch_markers(spark, tmp_path):
    root = str(tmp_path / "zone_markers")
    for i in range(3):
        versioned.commit_version(
            _df(spark, 0, 5), root, mode="overwrite", batch_tag=f"stream-{i}"
        )
    import os

    tags = os.path.join(root, "_commits_by_tag")
    assert len(os.listdir(tags)) == 3
    out = versioned.vacuum(root, keep_last=1, min_age_s=0)
    assert out["dropped_markers"] == 2
    assert os.listdir(tags) == ["stream-2"]


def test_changes_feed_append_overwrite_and_minimal(spark, tmp_path):
    """CDF: an append commit's change set is exactly its added files
    (inserts only, resolved from manifests — no diff); an overwrite is
    delete-all+insert-all by default and a true row-level delta with
    minimal=True."""
    root = str(tmp_path / "zone")

    def rows(df):
        return sorted(
            (r.k, r.v, r._change_type) for r in df.collect()
        )

    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a"), (2, "b")]), root)           # v0
    versioned.commit_version(d([(3, "c")]), root, mode="append")       # v1
    versioned.commit_version(d([(1, "a"), (3, "C")]), root, mode="overwrite")  # v2

    assert rows(versioned.changes(spark, root, 0)) == [
        (1, "a", "insert"), (2, "b", "insert")
    ]
    # append: just the new file's rows, not a diff of the whole zone
    assert rows(versioned.changes(spark, root, 1)) == [(3, "c", "insert")]
    # overwrite default: the logical truth (drop old snapshot, adopt new)
    assert rows(versioned.changes(spark, root, 2)) == [
        (1, "a", "delete"), (1, "a", "insert"),
        (2, "b", "delete"), (3, "C", "insert"), (3, "c", "delete"),
    ]
    # minimal: the unchanged (1, 'a') cancels out
    assert rows(versioned.changes(spark, root, 2, minimal=True)) == [
        (2, "b", "delete"), (3, "C", "insert"), (3, "c", "delete"),
    ]
    assert all(
        r._commit_version == 1
        for r in versioned.changes(spark, root, 1).collect()
    )


def test_changes_since_tails_commits_in_order(spark, tmp_path):
    """The incremental-consumer loop: read everything after a
    checkpointed version, advance the checkpoint to max(_commit_version),
    repeat; an empty range returns an empty typed frame."""
    root = str(tmp_path / "zone")
    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a")]), root)                   # v0
    versioned.commit_version(d([(2, "b")]), root, mode="append")    # v1
    versioned.commit_version(d([(3, "c")]), root, mode="append")    # v2

    feed = versioned.changes_since(spark, root, 0)
    got = sorted((r.k, r._commit_version) for r in feed.collect())
    assert got == [(2, 1), (3, 2)]
    assert versioned.changes_since(spark, root, 2).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        versioned.changes_since(spark, root, 99)


def test_changes_since_spans_schema_evolving_overwrite(spark, tmp_path):
    """A schema-evolving overwrite inside the range widens that commit's
    change feed (old+new columns); earlier append commits' old-schema
    frames must still union — NULL-padded — instead of dying with an
    AnalysisException (round-5 advice)."""
    root = str(tmp_path / "zone")
    d = lambda pairs, s: spark.createDataFrame(pairs, s)  # noqa: E731
    versioned.commit_version(d([(1, "a")], "k long, v string"), root)  # v0
    versioned.commit_version(
        d([(2, "b")], "k long, v string"), root, mode="append"
    )  # v1
    versioned.commit_version(
        d([(1, "a", 9.0)], "k long, v string, w double"),
        root,
        mode="overwrite",
    )  # v2: evolved schema
    feed = versioned.changes_since(spark, root, 0)
    got = sorted(
        (
            (r.k, r.v, r.w, r._change_type, r._commit_version)
            for r in feed.collect()
        ),
        key=lambda t: (t[0], t[3], t[4], t[2] is not None),
    )
    # v1's append is NULL-padded on w; v2 contributes full delete+insert
    assert got == [
        (1, "a", None, "delete", 2),
        (1, "a", 9.0, "insert", 2),
        (2, "b", None, "delete", 2),
        (2, "b", None, "insert", 1),
    ]


def test_changes_after_vacuum_raises_instead_of_replaying_zone(spark, tmp_path):
    """Once a commit's predecessor manifest is vacuumed its delta is
    unknowable: changes() must raise, not silently re-deliver the whole
    oldest surviving snapshot as inserts (which a consumer would
    double-apply)."""
    import pytest as _pytest

    root = str(tmp_path / "zone")
    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a")]), root)                  # v0
    versioned.commit_version(d([(2, "b")]), root, mode="append")   # v1
    versioned.commit_version(d([(3, "c")]), root, mode="append")   # v2
    versioned.vacuum(root, keep_last=2, min_age_s=0.0)
    assert versioned.versions(root) == [1, 2]
    with _pytest.raises(ValueError, match="vacuumed"):
        versioned.changes(spark, root, 1)
    # the commit whose predecessor survives still works
    assert sorted(
        r.k for r in versioned.changes(spark, root, 2).collect()
    ) == [3]


def test_changes_across_schema_evolution_null_pads(spark, tmp_path):
    """An overwrite that evolves the schema (the documented evolution
    path) yields the full delete+insert with old rows NULL-padded to the
    new columns — not an unresolved-column crash."""
    root = str(tmp_path / "zone")
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], "k long, v string"), root
    )
    versioned.commit_version(
        spark.createDataFrame([(1, "a", 9.0)], "k long, v string, w double"),
        root,
        mode="overwrite",
    )
    feed = versioned.changes(spark, root, 1, minimal=True)
    rows = sorted(
        ((r._change_type, r.k, r.v, r.w) for r in feed.collect()),
        key=lambda t: t[0],
    )
    assert rows == [("delete", 1, "a", None), ("insert", 1, "a", 9.0)]


def test_compact_snapshot_is_transactional(spark, tmp_path):
    """Compaction of a versioned zone is an overwrite COMMIT: rows
    identical, old versions still readable, small files reclaimed only
    by vacuum; medallion.compact refuses the root outright."""
    import pytest as _pytest

    from realtime_data_pipeline_spark import medallion

    root = str(tmp_path / "zone")
    for i in range(3):  # three tiny append commits -> many small files
        versioned.commit_version(
            spark.createDataFrame([(i, "x")], "k long, v string").repartition(4),
            root,
            mode="append" if i else "overwrite",
        )
    before = sorted(
        (r.k, r.v) for r in versioned.read_version(spark, root).collect()
    )
    with _pytest.raises(ValueError, match="VERSIONED zone"):
        medallion.compact(spark, root)
    out = versioned.compact_snapshot(spark, root, target_partitions=1)
    assert out["version"] == 3
    after = sorted(
        (r.k, r.v) for r in versioned.read_version(spark, root).collect()
    )
    assert after == before
    # pre-compaction version still time-travels
    assert versioned.read_version(spark, root, 2).count() == 3
    # compacted snapshot references exactly one data file
    assert len(versioned._read_manifest(root, 3)["files"]) == 1


def test_conditional_commit_rejects_stale_base(spark, tmp_path):
    """The compare-and-swap behind compact_snapshot: a commit carrying
    expected_latest older than the zone's actual latest raises instead
    of silently publishing over a state it never read."""
    import pytest as _pytest

    root = str(tmp_path / "zone")
    d = lambda k: spark.createDataFrame([(k, "x")], "k long, v string")  # noqa: E731
    versioned.commit_version(d(0), root)                        # v0
    versioned.commit_version(d(1), root, mode="append")         # v1
    with _pytest.raises(versioned.ConcurrentCommitError, match="expected 0"):
        versioned.commit_version(
            d(9), root, mode="overwrite", expected_latest=0
        )
    # the zone is untouched by the failed publish
    assert versioned.versions(root) == [0, 1]
    assert versioned.read_version(spark, root).count() == 2


def test_vacuum_spares_markers_of_commits_racing_it(spark, tmp_path):
    """A batch_tag marker claimed by a commit NEWER than the vacuum's
    snapshot of latest (the racing-commit window) must survive the
    marker sweep — removing it would make a stream restart republish the
    batch. Only markers of vacuumed history past the age guard drop."""
    import json as _json
    import os as _os

    root = str(tmp_path / "zone")
    d = lambda k: spark.createDataFrame([(k, "x")], "k long, v string")  # noqa: E731
    versioned.commit_version(d(0), root, batch_tag="stream-0")        # v0
    versioned.commit_version(d(1), root, mode="append", batch_tag="stream-1")
    versioned.commit_version(d(2), root, mode="append", batch_tag="stream-2")
    # simulate a commit racing the vacuum: its marker exists with a
    # version NEWER than what vacuum's keep-set will contain
    tag_dir = _os.path.join(root, "_commits_by_tag")
    with open(_os.path.join(tag_dir, "stream-99"), "w") as f:
        _json.dump({"version": 99, "files_added": 1, "rows": 1}, f)

    versioned.vacuum(root, keep_last=2, min_age_s=0.0)
    left = set(_os.listdir(tag_dir))
    # stream-0's version was vacuumed -> dropped; kept + racing survive
    assert left == {"stream-1", "stream-2", "stream-99"}
    # replay of the racing batch id still dedups
    replay = versioned.commit_version(
        d(9), root, mode="append", batch_tag="stream-99"
    )
    assert replay["skipped_replay"] is True


def test_cli_timetravel_guards_fresh_root(tmp_path):
    from realtime_data_pipeline_spark import cli

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="no committed versions"):
        cli.main([
            "timetravel", "rollback", "--root", str(tmp_path / "nope"),
            "--to", "3",
        ])


def test_writer_racing_compaction_never_loses_the_append(
    spark, tmp_path, monkeypatch
):
    """Torture: an append commit landing INSIDE compact_snapshot's
    read-compact-publish window (injected deterministically by wrapping
    read_version). The compaction's conditional commit must raise
    ConcurrentCommitError — never publish a snapshot that silently
    drops the racer's rows — and a re-run in a quiet window must then
    succeed with every row intact."""
    import pytest as _pytest

    root = str(tmp_path / "zone")
    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a"), (2, "b")]), root)  # v0

    real_read = versioned.read_version
    raced = {"done": False}

    def read_then_race(spark_, root_, version):
        df = real_read(spark_, root_, version)
        if not raced["done"]:
            raced["done"] = True
            # the racing writer lands AFTER compaction read its base
            versioned.commit_version(
                d([(3, "c")]), root_, mode="append"
            )  # v1
        return df

    monkeypatch.setattr(versioned, "read_version", read_then_race)
    with _pytest.raises(versioned.ConcurrentCommitError):
        versioned.compact_snapshot(spark, root, target_partitions=1)
    monkeypatch.setattr(versioned, "read_version", real_read)

    # the racer's append is the latest snapshot; nothing lost
    assert versioned.versions(root) == [0, 1]
    assert sorted(
        r.k for r in versioned.read_version(spark, root).collect()
    ) == [1, 2, 3]

    # quiet-window re-run compacts v1's full content
    out = versioned.compact_snapshot(spark, root, target_partitions=1)
    assert out["version"] == 2
    assert sorted(
        r.k for r in versioned.read_version(spark, root).collect()
    ) == [1, 2, 3]


def test_file_stats_recorded_and_pruned_reads_match_full_filter(
    spark, tmp_path
):
    """Data skipping: commits record per-file footer min/max in the
    manifest (appends carry prior files' stats forward), and
    read_version_where drops provably-dead files BEFORE the scan while
    returning exactly read_version().filter(...)."""
    import datetime

    root = str(tmp_path / "zone")
    d0 = datetime.date(2024, 1, 1)
    for lo in (0, 100, 200, 300):  # one file per commit, disjoint ranges
        df = spark.range(lo, lo + 100).select(
            F.col("id"),
            F.date_add(F.lit(d0), F.col("id").cast("int")).alias("day"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
        versioned.commit_version(df.coalesce(1), root, mode="append")

    man = versioned._read_manifest(root, 3)
    assert len(man["files"]) == 4
    # every file carries stats for every column, including carried-over
    # files from earlier commits
    for f in man["files"]:
        st = man["file_stats"][f]
        assert set(st) == {"id", "day", "v"}
    ids = sorted(
        tuple(man["file_stats"][f]["id"][:2]) for f in man["files"]
    )
    assert ids == [(0, 99), (100, 199), (200, 299), (300, 399)]
    # each entry carries its kind marker (int / date / float)
    st0 = man["file_stats"][man["files"][0]]
    assert [st0["id"][2], st0["day"][2], st0["v"][2]] == ["n", "d", "f"]

    # int predicate: one surviving file out of four
    rep = versioned.prune_report(root, [("id", "<", 50)])
    assert rep == {
        "version": 3, "total_files": 4, "kept_files": 1, "skipped_files": 3,
    }
    got = versioned.read_version_where(spark, root, [("id", "<", 50)])
    want = versioned.read_version(spark, root).filter(F.col("id") < 50)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # date predicate: ISO-string order == chronological order
    rep = versioned.prune_report(
        root, [("day", ">=", datetime.date(2024, 11, 1))]
    )
    assert rep["skipped_files"] >= 2
    got = versioned.read_version_where(
        spark, root, [("day", ">=", datetime.date(2024, 11, 1))]
    )
    want = versioned.read_version(spark, root).filter(
        F.col("day") >= F.lit(datetime.date(2024, 11, 1))
    )
    assert got.count() == want.count() > 0

    # conjunction that kills every file -> typed empty, zero files read
    rep = versioned.prune_report(
        root, [("id", ">", 150), ("id", "<", 60)]
    )
    assert rep["kept_files"] < 4
    empty = versioned.read_version_where(
        spark, root, [("id", ">", 1000)]
    )
    assert empty.count() == 0 and "day" in empty.columns

    # unknown column / unsupported literal never prunes (kept = total)
    rep = versioned.prune_report(root, [("nope", "=", 5)])
    assert rep["kept_files"] == rep["total_files"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="predicate"):
        versioned.prune_report(root, [("id", "!=", 5)])


@pytest.mark.slow
def test_stats_pruning_nan_floats_and_timestamp_literals(spark, tmp_path):
    """Two comparison-regime traps in the pruner, end to end:

    1. NaN floats — footer min/max exclude NaN but Spark's filter
       treats NaN as larger than every value, so ``x > v`` must KEEP a
       file whose only matching rows are NaN (``read_version_where``
       must equal ``read_version().filter(...)`` exactly);
    2. timestamp literals — stats are isoformat ('T' separator); a
       space-separated user literal must compare chronologically, both
       for soundness (no wrong prune) and to keep pruning power."""
    import datetime

    root = str(tmp_path / "zone")
    t0 = datetime.datetime(2024, 1, 1, 1, 0, 0)
    df0 = spark.createDataFrame(
        [(1, 1.0, t0), (2, float("nan"), t0.replace(hour=2))],
        "id bigint, x double, ts timestamp",
    )
    df1 = spark.createDataFrame(
        [
            (3, 5.0, datetime.datetime(2024, 3, 1, 0, 0, 0)),
            (4, 6.0, datetime.datetime(2024, 3, 2, 0, 0, 0)),
        ],
        "id bigint, x double, ts timestamp",
    )
    versioned.commit_version(df0.coalesce(1), root)
    versioned.commit_version(df1.coalesce(1), root, mode="append")

    # float >: file 0's recorded max (1.0, NaN excluded) disproves the
    # range, but its NaN row matches in Spark — upper-bound ops must
    # never prune float files, and the result must include id=2
    rep = versioned.prune_report(root, [("x", ">", 3.0)])
    assert rep["skipped_files"] == 0
    got = versioned.read_version_where(spark, root, [("x", ">", 3.0)])
    want = versioned.read_version(spark, root).filter(F.col("x") > 3.0)
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )
    assert 2 in {r.id for r in got.collect()}

    # float < / = stay prunable (NaN rows can never match them)
    rep = versioned.prune_report(root, [("x", "<", 0.5)])
    assert rep["skipped_files"] >= 1
    got = versioned.read_version_where(spark, root, [("x", "<", 0.5)])
    want = versioned.read_version(spark, root).filter(F.col("x") < 0.5)
    assert got.count() == want.count() == 0

    # space-separated timestamp literal: must keep file 0 (its rows
    # match) AND still prune file 1 (all of March) — chronological
    # comparison, not lexicographic-vs-'T'
    lit = "2024-01-01 02:00:00"
    rep = versioned.prune_report(root, [("ts", "<=", lit)])
    assert rep == {
        "version": 1, "total_files": 2, "kept_files": 1, "skipped_files": 1,
    }
    got = versioned.read_version_where(spark, root, [("ts", "<=", lit)])
    want = versioned.read_version(spark, root).filter(F.col("ts") <= lit)
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    ) == [1, 2]

    # unparseable pseudo-timestamp literal on a timestamp column: never
    # prunes (kept == total), result still equals the full filter
    rep = versioned.prune_report(root, [("ts", "<=", "2024-1-1 02:00")])
    assert rep["kept_files"] == rep["total_files"]


def test_file_stats_survive_rollback_and_overwrite(spark, tmp_path):
    """Rollback republishes the source manifest's stats; an overwrite
    records fresh stats for its own files only."""
    root = str(tmp_path / "zone")
    versioned.commit_version(
        spark.range(0, 50).coalesce(1), root, mode="append"
    )
    versioned.commit_version(
        spark.range(1000, 1100).coalesce(1), root, mode="overwrite"
    )
    man1 = versioned._read_manifest(root, 1)
    assert [
        tuple(man1["file_stats"][f]["id"][:2]) for f in man1["files"]
    ] == [(1000, 1099)]
    versioned.rollback(root, to_version=0)
    man2 = versioned._read_manifest(root, 2)
    assert [
        tuple(man2["file_stats"][f]["id"][:2]) for f in man2["files"]
    ] == [(0, 49)]
    rep = versioned.prune_report(root, [("id", ">=", 10)])
    assert rep["kept_files"] == 1


def test_bloom_sidecar_prunes_point_lookups_stats_cannot(spark, tmp_path):
    """Per-file bloom bitmaps (commit_version(bloom_cols=...)): on a
    high-cardinality column NOT sorted into the file layout, every
    file's [min, max] spans the whole domain — range stats prune
    nothing — but the bloom proves which files can hold an equality
    key. Pruned reads must equal the unpruned filter exactly."""
    root = str(tmp_path / "zone_bloom")
    # file i holds ids ≡ i (mod 4): min/max ranges all span ~[0, 400)
    for i in range(4):
        df = spark.range(i, 400, 4).select(
            F.col("id"),
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
        versioned.commit_version(
            df.coalesce(1), root, mode="append", bloom_cols=["id", "key"]
        )

    man = versioned._read_manifest(root, 3)
    assert len(man["files"]) == 4
    # every file (including carried-over ones) has both columns' blooms
    for f in man["files"]:
        ent = man["file_blooms"][f]
        assert set(ent) == {"id", "key"}
        assert ent["id"]["kind"] == "n" and ent["key"]["kind"] == "s"

    # min/max alone keeps all 4 files for an interior key
    stats_only = [
        f
        for f in man["files"]
        if versioned._file_may_match(
            man["file_stats"].get(f), [("id", "=", 37)]
        )
    ]
    assert len(stats_only) == 4

    # the bloom pins the one file whose residue class holds the key
    rep = versioned.prune_report(root, [("id", "=", 37)])
    assert rep["kept_files"] == 1 and rep["skipped_files"] == 3
    got = versioned.read_version_where(spark, root, [("id", "=", 37)])
    want = versioned.read_version(spark, root).filter(F.col("id") == 37)
    assert sorted(r["key"] for r in got.collect()) == sorted(
        r["key"] for r in want.collect()
    ) == ["k37"]

    # string column probe
    rep = versioned.prune_report(root, [("key", "=", "k38")])
    assert rep["kept_files"] == 1
    got = versioned.read_version_where(spark, root, [("key", "=", "k38")])
    assert [r["id"] for r in got.collect()] == [38]

    # absent key: every file provably dead -> typed-empty zero-file read
    rep = versioned.prune_report(root, [("id", "=", 123456)])
    assert rep["kept_files"] == 0
    empty = versioned.read_version_where(spark, root, [("id", "=", 123456)])
    assert empty.count() == 0 and "key" in empty.columns

    # a type-mismatched literal (string probe of the int column) proves
    # nothing on either path — Spark would cast, the bitmap would not
    rep = versioned.prune_report(root, [("id", "=", "37")])
    assert rep["kept_files"] == 4

    # non-equality ops never consult the bloom (range stats own those)
    rep = versioned.prune_report(root, [("id", "<", 100)])
    assert rep["kept_files"] == 4

    # conjunction: bloom equality + range stat compose (AND of proofs)
    rep = versioned.prune_report(root, [("id", "=", 37), ("v", "<=", 10.0)])
    assert rep["kept_files"] == 1


def test_bloom_cols_validation_and_null_keys(spark, tmp_path):
    root = str(tmp_path / "zone_bloom_val")
    df = _df(spark, 0, 10)
    # unsupported dtype (double) and unknown column both refuse loudly
    with pytest.raises(ValueError, match="integral and string"):
        versioned.commit_version(
            df.select(F.col("id"), F.col("v").cast("double").alias("v")),
            root,
            bloom_cols=["v"],
        )
    with pytest.raises(ValueError, match="not a column"):
        versioned.commit_version(df, root, bloom_cols=["nope"])
    with pytest.raises(ValueError, match="bloom_bits"):
        versioned.commit_version(df, root, bloom_cols=["id"], bloom_bits=12)

    # an all-NULL key file records no bitmap and is never pruned
    # (absence keeps the file — skipping stays an optimization)
    null_df = spark.range(5).select(
        F.lit(None).cast("long").alias("id"),
        F.lit(None).cast("string").alias("key"),
    )
    versioned.commit_version(
        null_df.coalesce(1), root, mode="overwrite", bloom_cols=["id", "key"]
    )
    man = versioned._read_manifest(root, versioned.versions(root)[-1])
    assert not man.get("file_blooms")
    rep = versioned.prune_report(root, [("id", "=", 3)])
    assert rep["kept_files"] == rep["total_files"] == 1
    # equality never matches NULL rows, so the kept file yields nothing
    assert (
        versioned.read_version_where(spark, root, [("id", "=", 3)]).count()
        == 0
    )


def test_bloom_int64_above_2p53_with_nulls_not_falsely_pruned(
    spark, tmp_path
):
    """Round-8 ADVICE regression: an integral bloom column that contains
    a NULL used to reach the pandas encoder as float64, rounding values
    above 2^53 before their bits were set — a probe of the exact int
    literal then found the bits UNSET and wrongly pruned the file
    (silent missing rows). The builder now casts to string Spark-side
    (exact across the full int64 range), so the no-false-negatives
    contract holds: every present key is found, file-skipping included.
    """
    root = str(tmp_path / "zone_bloom_i64")
    # 2^53 + 1 is the first int float64 cannot represent; also test the
    # int64 extremes and a neighbor pair that float64 collapses
    big = [
        2**53 + 1,
        2**53 + 3,
        2**62 + 12345,
        -(2**61 + 7),
        2**63 - 1,
        -(2**63),
    ]
    rows = [(v, f"k{i}") for i, v in enumerate(big)] + [(None, "knull")]
    df = spark.createDataFrame(rows, "id long, key string")
    # several files so pruning is actually exercised
    versioned.commit_version(
        df.repartition(4), root, mode="overwrite", bloom_cols=["id"]
    )
    man = versioned._read_manifest(root, versioned.versions(root)[-1])
    assert man.get("file_blooms")  # bitmaps recorded despite the NULL
    for v in big:
        got = versioned.read_version_where(
            spark, root, [("id", "=", v)]
        ).collect()
        assert [r["id"] for r in got] == [v], f"lost key {v}"
    # the float64-collapsed neighbor must NOT alias: 2^53+2 is absent
    # and distinct from both present neighbors
    assert (
        versioned.read_version_where(
            spark, root, [("id", "=", 2**53 + 2)]
        ).count()
        == 0
    )


def test_diff_versions_net_delta_with_shared_file_cancellation(
    spark, tmp_path
):
    """diff_versions answers the NET cross-span question in one step:
    appends surface as inserts only, an overwrite surfaces the true
    row-level delta, a pure re-layout compaction diffs EMPTY, shared
    files cancel at the manifest (file) level before any read, a
    schema-evolving span falls back to the full NULL-padded swap, and
    the identity diff is empty."""
    root = str(tmp_path / "zone_diff")
    d = lambda rows: spark.createDataFrame(rows, "k long, v string")  # noqa: E731

    versioned.commit_version(d([(1, "a"), (2, "b")]), root)           # v0
    versioned.commit_version(d([(3, "c")]), root, mode="append")      # v1
    versioned.commit_version(d([(4, "d")]), root, mode="append")      # v2

    def delta(vf, vt):
        return {
            (r.k, r.v, r._change_type)
            for r in versioned.diff_versions(spark, root, vf, vt).collect()
        }

    # append-only span: net inserts, no deletes
    assert delta(0, 2) == {(3, "c", "insert"), (4, "d", "insert")}
    # reverse span: the same rows as deletes
    assert delta(2, 0) == {(3, "c", "delete"), (4, "d", "delete")}
    # identity: empty
    assert delta(1, 1) == set()

    # zero-shuffle contract on the append-only span: no exceptAll planned
    plan = versioned.diff_versions(
        spark, root, 0, 2
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Except" not in plan

    # overwrite replacing part of the zone: net row-level delta
    versioned.commit_version(
        d([(1, "a"), (3, "c"), (9, "z")]), root, mode="overwrite"
    )                                                                  # v3
    assert delta(2, 3) == {
        (9, "z", "insert"),
        (2, "b", "delete"),
        (4, "d", "delete"),
    }

    # pure re-layout (compaction): all rows rewritten into new files,
    # yet the multiset diff is empty
    versioned.compact_snapshot(spark, root, target_partitions=1)           # v4
    assert delta(3, 4) == set()

    # schema change across the span: full swap, NULL-padded
    versioned.commit_version(
        spark.createDataFrame([(7, "q", 1.5)], "k long, v string, w double"),
        root,
        mode="overwrite",
    )                                                                  # v5
    rows = versioned.diff_versions(spark, root, 4, 5).collect()
    ins = {(r.k, r.v, r.w) for r in rows if r._change_type == "insert"}
    dels = {(r.k, r.v, r.w) for r in rows if r._change_type == "delete"}
    assert ins == {(7, "q", 1.5)}
    assert dels == {(1, "a", None), (3, "c", None), (9, "z", None)}

    import pytest

    with pytest.raises(ValueError, match="not in"):
        versioned.diff_versions(spark, root, 0, 99)


def test_external_reader_sql_duckdb_reads_pinned_snapshots(
    spark, tmp_path
):
    """The open-format proof, executed: DuckDB reads every snapshot of a
    versioned zone through external_reader_sql and gets exactly what
    read_version returns — INCLUDING the superseded pre-overwrite
    version (snapshot isolation rides the pinned file list, no Spark
    involved on the reader side)."""
    import duckdb

    root = str(tmp_path / "zone_ext")
    d = lambda rows: spark.createDataFrame(rows, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a"), (2, "b")]), root)           # v0
    versioned.commit_version(d([(3, "c")]), root, mode="append")      # v1
    versioned.commit_version(d([(9, "z")]), root, mode="overwrite")   # v2

    con = duckdb.connect()
    for v in (0, 1, 2):
        got = {
            tuple(r)
            for r in con.execute(
                versioned.external_reader_sql(root, v)
            ).fetchall()
        }
        want = {
            (r.k, r.v)
            for r in versioned.read_version(spark, root, v).collect()
        }
        assert got == want, v
    # latest by default; view form parses and reads
    con.execute(versioned.external_reader_sql(root, table_alias="zview"))
    assert con.execute("SELECT * FROM zview").fetchall() == [(9, "z")]

    # an empty-FRAME commit still writes a (zero-row) parquet file, and
    # the external reader opens it fine
    versioned.commit_version(
        d([]).limit(0), root, mode="overwrite"
    )                                                                  # v3
    assert con.execute(versioned.external_reader_sql(root, 3)).fetchall() == []

    # a truly FILE-LESS manifest (empty micro-batch commits record no
    # files) has nothing an external reader can type — refused loudly
    import json as _json
    import os as _os

    with open(versioned._manifest_path(root, 4), "w") as f:
        _json.dump(
            {"version": 4, "mode": "overwrite", "files": [],
             "schema": "struct<k:bigint,v:string>"},
            f,
        )
    with pytest.raises(ValueError, match="empty snapshot"):
        versioned.external_reader_sql(root, 4)
    _os.unlink(versioned._manifest_path(root, 4))


@pytest.mark.slow
def test_zordered_commit_prunes_on_both_clustered_columns(
    spark, tmp_path
):
    """commit_version(zorder_cols=[a, b]) — the round-9 verdict
    composition: the commit's files are Morton-clustered, so the
    manifest's per-file min/max stats skip files for selective
    predicates on EITHER clustered column, and the pruned read equals
    the full-scan filter exactly. An unclustered twin commit of the
    same data keeps (nearly) all files for the same predicates — the
    skipping comes from the layout, not the predicate."""
    # anti-correlated columns: a hash layout gives every file the full
    # range of both; z-order gives each file a small hyper-cube
    df = spark.range(20_000).select(
        F.col("id").alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(20_000)).alias("b"),
    )

    flat = str(tmp_path / "flat")
    versioned.commit_version(
        df.repartition(16), flat, mode="overwrite"
    )
    zord = str(tmp_path / "zord")
    out = versioned.commit_version(
        df, zord, mode="overwrite", zorder_cols=["a", "b"],
        zorder_files=16,
    )
    assert out["files_added"] == 16

    for col in ("a", "b"):
        preds = [(col, ">=", 1000), (col, "<", 2000)]
        rep_flat = versioned.prune_report(flat, preds)
        rep_z = versioned.prune_report(zord, preds)
        # the hash layout cannot skip; the z-ordered commit must skip
        # more than half the files on BOTH columns
        assert rep_flat["kept_files"] == rep_flat["total_files"], col
        assert rep_z["kept_files"] <= rep_z["total_files"] // 2, (
            col, rep_z,
        )
        got = versioned.read_version_where(spark, zord, preds)
        want = versioned.read_version(spark, zord).filter(
            (F.col(col) >= 1000) & (F.col(col) < 2000)
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    # composes with append history: a second z-ordered commit keeps
    # pruning through the union manifest
    versioned.commit_version(
        spark.range(20_000, 40_000).select(
            F.col("id").alias("a"),
            F.pmod(F.xxhash64("id"), F.lit(20_000)).alias("b"),
        ),
        zord, mode="append", zorder_cols=["a", "b"], zorder_files=16,
    )
    rep = versioned.prune_report(zord, [("a", "<", 1000)])
    assert rep["total_files"] == 32 and rep["kept_files"] <= 8

    import pytest

    with pytest.raises(ValueError, match="collect_stats"):
        versioned.commit_version(
            df, str(tmp_path / "bad"), zorder_cols=["a"],
            collect_stats=False,
        )


@pytest.mark.slow
def test_delete_keys_prunes_rewrites_and_time_travels(spark, tmp_path):
    """GDPR key erasure: only files that CAN contain a doomed key are
    rewritten (manifest stats/bloom pruning), every other file is
    carried by reference byte-identical; the latest snapshot loses
    exactly the doomed rows, older versions still time-travel to them,
    and NULL keys survive."""
    root = str(tmp_path / "zone_del")
    a = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "id long, v long"
    ).coalesce(1)
    b = spark.createDataFrame(
        [(i, i * 2) for i in range(100, 200)] + [(None, -1)],
        "id long, v long",
    ).coalesce(1)
    versioned.commit_version(a, root, mode="append", bloom_cols=["id"])
    versioned.commit_version(b, root, mode="append", bloom_cols=["id"])
    man_before = versioned._read_manifest(root, 1)

    out = versioned.delete_keys(spark, root, "id", [150, 199])
    assert out["rows_deleted"] == 2
    assert out["files_rewritten"] >= 1
    # commit A's file range [0,100) cannot contain 150/199 -> carried
    assert out["files_carried"] >= 1
    man_after = versioned._read_manifest(root, out["version"])
    carried_paths = set(man_before["files"]) & set(man_after["files"])
    assert len(carried_paths) >= 1  # literal file reuse, not rewrite

    latest = versioned.read_version(spark, root)
    ids = {r["id"] for r in latest.collect()}
    assert 150 not in ids and 199 not in ids
    assert None in ids  # NULL keys survive
    assert latest.count() == 201 - 2
    # time travel still sees the erased rows until vacuum
    assert versioned.read_version(spark, root, 1).filter(
        F.col("id").isin([150, 199])
    ).count() == 2


def test_delete_keys_absent_key_is_noop(spark, tmp_path):
    """Erasing keys the zone never held publishes NOTHING: stats/bloom
    pruning short-circuits, and even a bloom false positive (rewrite
    finds zero matching rows) is rolled back without a commit."""
    root = str(tmp_path / "zone_del_noop")
    versioned.commit_version(
        _df(spark, 0, 50).coalesce(1), root, bloom_cols=["id"]
    )
    before = versioned.versions(root)
    out = versioned.delete_keys(spark, root, "id", [9999])
    assert out.get("noop") is True
    assert versioned.versions(root) == before


def test_delete_keys_rewritten_files_keep_bloom_pruning(spark, tmp_path):
    """The rewrite re-indexes the surviving rows with the zone's stored
    bloom geometry, so point-lookup pruning keeps working after an
    erasure commit."""
    root = str(tmp_path / "zone_del_bloom")
    versioned.commit_version(
        _df(spark, 0, 100).coalesce(1), root, bloom_cols=["id"]
    )
    out = versioned.delete_keys(spark, root, "id", [3])
    man = versioned._read_manifest(root, out["version"])
    assert man.get("file_blooms"), "rewritten files lost their blooms"
    # pruned point read agrees with the full filter
    got = versioned.read_version_where(
        spark, root, [("id", "=", 7)]
    ).collect()
    assert [r["id"] for r in got] == [7]
    assert versioned.read_version_where(
        spark, root, [("id", "=", 3)]
    ).count() == 0


@pytest.mark.slow
def test_changes_of_delete_commit_emits_only_erased_rows(spark, tmp_path):
    """CDC over an erasure commit: the feed is exactly the doomed rows
    tagged delete — carried files cancel at the manifest level, so the
    read touches only the rewritten subset (asserted via inputFiles),
    never the whole snapshot."""
    root = str(tmp_path / "zone_del_cdc")
    a = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "id long, v long"
    ).coalesce(1)
    b = spark.createDataFrame(
        [(i, i * 2) for i in range(100, 200)], "id long, v long"
    ).coalesce(1)
    versioned.commit_version(a, root, mode="append")
    versioned.commit_version(b, root, mode="append")
    out = versioned.delete_keys(spark, root, "id", [150])
    feed = versioned.changes(spark, root, out["version"])
    rows = feed.collect()
    assert [(r["id"], r["_change_type"]) for r in rows] == [(150, "delete")]
    # manifest-level cancellation: commit A's carried file is never read
    man0 = versioned._read_manifest(root, 0)
    read_files = set(feed.inputFiles())
    for carried in man0["files"]:
        assert not any(carried in f for f in read_files)


def test_delete_keys_replay_is_idempotent(spark, tmp_path):
    """Replaying an erasure (a retried job, a foreachBatch restart) is
    naturally idempotent: the rewritten files' rebuilt blooms no longer
    contain the doomed keys, so the second call either prunes to zero
    candidate files or rolls back a zero-row rewrite — either way it
    publishes NOTHING and the version history gains exactly one commit."""
    root = str(tmp_path / "zone_del_replay")
    versioned.commit_version(
        _df(spark, 0, 100).coalesce(1), root, bloom_cols=["id"]
    )
    first = versioned.delete_keys(spark, root, "id", [5, 6])
    assert first["rows_deleted"] == 2
    again = versioned.delete_keys(spark, root, "id", [5, 6])
    assert again.get("noop") is True
    assert versioned.versions(root) == [0, first["version"]]
    assert versioned.read_version(spark, root).count() == 98


@pytest.mark.slow
def test_delete_keys_retries_cas_losses_then_succeeds(
    spark, tmp_path, monkeypatch
):
    """delete_keys honors max_retries with the optimistic re-read loop:
    two injected CAS losses are retried transparently (each retry would
    re-read latest and re-prune), the third attempt lands; with the
    budget below the loss count the last ConcurrentCommitError
    surfaces."""
    root = str(tmp_path / "zone_retry")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, v string"
    ).coalesce(1)
    versioned.commit_version(df, root, bloom_cols=["id"])

    real_once = versioned._delete_keys_once
    fails = {"left": 2}

    def flaky(spark_, root_, col_, values_):
        if fails["left"] > 0:
            fails["left"] -= 1
            raise versioned.ConcurrentCommitError("injected race")
        return real_once(spark_, root_, col_, values_)

    monkeypatch.setattr(versioned, "_delete_keys_once", flaky)
    out = versioned.delete_keys(spark, root, "id", [3], max_retries=5)
    assert out["rows_deleted"] == 1 and fails["left"] == 0

    fails["left"] = 2
    import pytest as _pytest

    with _pytest.raises(versioned.ConcurrentCommitError, match="injected"):
        versioned.delete_keys(spark, root, "id", [4], max_retries=2)
