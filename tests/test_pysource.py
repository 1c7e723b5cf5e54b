"""Custom Python data source (pysource.py): batch generation, partition
determinism, event_id filter pushdown, and exactly-once streaming
restart continuity via checkpointed offsets."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan, StringContains

from realtime_data_pipeline_spark import pysource
import pytest


def _events(spark, **opts):
    pysource.register(spark)
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_batch_generates_exact_row_range(spark):
    df = _events(spark, n_rows=1000, n_partitions=7)
    assert df.count() == 1000
    stats = df.agg(
        F.countDistinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).collect()[0]
    assert (stats["d"], stats["lo"], stats["hi"]) == (1000, 0, 999)
    assert set(df.schema.fieldNames()) == {
        "event_id", "ts", "user_id", "event_type", "value", "props",
    }


def test_batch_rows_identical_across_partitioning(spark):
    """Every column is a pure function of the global row index, so the
    dataset must be byte-identical no matter how the index space is
    split across partitions."""
    a = _events(spark, n_rows=500, n_partitions=3)
    b = _events(spark, n_rows=500, n_partitions=11)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_event_id_filter_pushdown_narrows_generation(spark):
    df = _events(spark, n_rows=100_000, n_partitions=8)
    assert df.filter(F.col("event_id") < 100).count() == 100
    assert (
        df.filter(
            (F.col("event_id") >= 200) & (F.col("event_id") < 300)
        ).count()
        == 100
    )
    # residual (non-pushable) predicates still apply on top
    mixed = df.filter(
        (F.col("event_id") < 1000) & (F.col("event_type") == "click")
    )
    assert 0 < mixed.count() < 1000


def test_push_filters_unit_range_and_leftovers():
    reader = pysource._BatchReader({"n_rows": "1000", "n_partitions": "4"})
    leftovers = list(
        reader.pushFilters(
            [
                LessThan(("event_id",), 300),
                GreaterThanOrEqual(("event_id",), 100),
                StringContains(("event_type",), "cl"),
                EqualTo(("user_id",), 5),
            ]
        )
    )
    assert (reader.lo, reader.hi) == (100, 300)
    # only the two event_id range filters were absorbed
    assert len(leftovers) == 2
    parts = reader.partitions()
    assert sum(p.hi - p.lo for p in parts) == 200


def test_streaming_restart_resumes_from_checkpoint(spark, tmp_path):
    """Offsets are row indexes handed back by the checkpoint: stopping at
    max_rows=300 and restarting with max_rows=500 must append exactly
    rows 300..499 — no duplicates, no gap, no driver state involved."""
    pysource.register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run(max_rows: int) -> None:
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 100)
            .option("max_rows", max_rows)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(300)
    first = spark.read.parquet(out)
    assert first.count() == 300
    assert first.select("event_id").distinct().count() == 300

    run(500)
    second = spark.read.parquet(out)
    assert second.count() == 500
    stats = second.agg(
        F.countDistinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).collect()[0]
    assert (stats["d"], stats["lo"], stats["hi"]) == (500, 0, 499)


def test_streaming_rows_match_batch_rows(spark, tmp_path):
    """The stream replays the same pure function of the row index the
    batch reader evaluates — identical options must yield identical
    rows, making any offset range deterministically re-readable."""
    pysource.register(spark)
    out = str(tmp_path / "sink_eq")
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 64)
        .option("max_rows", 200)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_eq"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.read.parquet(out)
    batch = _events(spark, n_rows=200)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_jsonl_audit_batch_write_two_phase(spark, tmp_path):
    """Batch write publishes files atomically behind a manifest; the
    manifest-gated read sees exactly the written rows and ignores any
    staged leftovers."""
    import os

    pysource.register(spark)
    out = str(tmp_path / "audit")
    df = _events(spark, n_rows=150, n_partitions=4)
    df.write.format("jsonl_audit").option("path", out).mode("append").save()

    # plant a torn-run leftover: must be invisible to the gated read
    os.makedirs(os.path.join(out, ".staged"), exist_ok=True)
    with open(os.path.join(out, ".staged", "part-dead.jsonl"), "w") as f:
        f.write('{"event_id": 99999}\n')

    back = pysource.read_jsonl_audit(spark, out)
    assert back.count() == 150
    assert back.select("event_id").distinct().count() == 150
    assert not back.filter(F.col("event_id") == 99999).count()


@pytest.mark.slow
def test_jsonl_audit_stream_replay_publishes_nothing_twice(spark, tmp_path):
    """A restarted streaming query replays its last uncommitted-by-Spark
    batch; the sink's manifest check must publish the replayed batch at
    most once (exactly-once by two-phase commit)."""
    pysource.register(spark)
    out = str(tmp_path / "audit_stream")
    ckpt = str(tmp_path / "ckpt_audit")

    def run(max_rows: int) -> None:
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 50)
            .option("max_rows", max_rows)
            .load()
            .writeStream.format("jsonl_audit")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(150)
    run(250)  # restart: continues 150..249, replays nothing into the data
    back = pysource.read_jsonl_audit(spark, out)
    assert back.count() == 250
    stats = back.agg(
        F.countDistinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).collect()[0]
    assert (stats["d"], stats["lo"], stats["hi"]) == (250, 0, 249)


def test_paged_jsonl_fetches_pages_in_parallel_partitions(spark, tmp_path):
    """One input partition per page URL, fetched executor-side — the
    parallel generalization of the reference's serial driver download;
    missing keys surface as NULLs under the declared schema."""
    import json

    for p in range(4):
        with open(tmp_path / f"page_{p}.jsonl", "w") as f:
            for i in range(25):
                rec = {"id": p * 25 + i, "name": f"r{p}_{i}"}
                if i % 5 == 0:
                    del rec["name"]  # missing key -> NULL
                f.write(json.dumps(rec) + "\n")

    pysource.register(spark)
    df = (
        spark.read.format("paged_jsonl")
        .schema("id long, name string")
        .option("url_template", f"file://{tmp_path}/page_{{page}}.jsonl")
        .option("pages", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert df.filter(F.col("name").isNull()).count() == 20
    assert df.agg(F.countDistinct("id")).collect()[0][0] == 100


def test_paged_jsonl_requires_declared_schema(spark):
    import pytest

    pysource.register(spark)
    with pytest.raises(Exception, match="explicit .schema"):
        (
            spark.read.format("paged_jsonl")
            .option("url_template", "file:///nope_{page}.jsonl")
            .option("pages", 1)
            .load()
        )


def test_jsonl_audit_batch_append_accumulates_and_overwrite_replaces(
    spark, tmp_path
):
    """Each batch write publishes under a fresh manifest (a second append
    must ADD rows, not be mistaken for a replay and dropped), and
    mode('overwrite') clears previously committed data first."""
    pysource.register(spark)
    out = str(tmp_path / "audit_multi")
    a = _events(spark, n_rows=100)
    b = _events(spark, n_rows=300).filter(F.col("event_id") >= 100)

    a.write.format("jsonl_audit").option("path", out).mode("append").save()
    b.write.format("jsonl_audit").option("path", out).mode("append").save()
    assert pysource.read_jsonl_audit(spark, out).count() == 300

    a.write.format("jsonl_audit").option("path", out).mode("overwrite").save()
    back = pysource.read_jsonl_audit(spark, out)
    assert back.count() == 100
    assert back.agg(F.max("event_id")).collect()[0][0] == 99


def test_jsonl_audit_roundtrips_nested_structs(spark, tmp_path):
    """Nested struct/array columns must serialize as real JSON objects
    (recursive asDict), not Row repr strings."""
    pysource.register(spark)
    out = str(tmp_path / "audit_nested")
    df = spark.sql(
        "SELECT id, named_struct('a', id * 2, 'tags', array('x', 'y')) AS meta "
        "FROM range(10)"
    )
    df.write.format("jsonl_audit").option("path", out).mode("append").save()
    back = pysource.read_jsonl_audit(
        spark, out, schema="id long, meta struct<a:long, tags:array<string>>"
    )
    assert back.count() == 10
    row = back.filter(F.col("id") == 3).collect()[0]
    assert row.meta.a == 6 and row.meta.tags == ["x", "y"]


def test_jsonl_audit_empty_read_requires_schema(spark, tmp_path):
    import pytest

    empty = str(tmp_path / "never_written")
    with pytest.raises(ValueError, match="pass\\s+schema"):
        pysource.read_jsonl_audit(spark, empty)
    df = pysource.read_jsonl_audit(spark, empty, schema="user_id long")
    assert df.count() == 0 and df.columns == ["user_id"]


def test_paged_jsonl_rejects_template_without_placeholder(spark):
    import pytest

    pysource.register(spark)
    with pytest.raises(Exception, match="placeholder"):
        (
            spark.read.format("paged_jsonl")
            .schema("id long")
            .option("url_template", "file:///dump.jsonl")
            .option("pages", 10)
            .load()
            .count()
        )


@pytest.mark.slow
def test_zone_changes_streams_commits_as_microbatches(spark, tmp_path):
    """The versioned zone is a streaming SOURCE: each append commit's
    added files arrive as one micro-batch tagged _commit_version, read
    executor-side; a restart picks up exactly the commits that landed
    after the checkpointed version."""
    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a")]), root)                  # v0
    versioned.commit_version(d([(2, "b")]), root, mode="append")   # v1

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run() -> None:
        q = (
            spark.readStream.format("zone_changes")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    got = sorted(
        (r.k, r.v, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "a", 0), (2, "b", 1)]

    # two more commits land; the restarted query emits exactly those
    versioned.commit_version(d([(3, "c")]), root, mode="append")   # v2
    versioned.commit_version(d([(4, "d")]), root, mode="append")   # v3
    run()
    got = sorted(
        (r.k, r.v, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "a", 0), (2, "b", 1), (3, "c", 2), (4, "d", 3)]


@pytest.mark.slow
def test_zone_changes_overwrite_policy(spark, tmp_path):
    """An overwrite commit is not expressible as an append feed: the
    default fails the stream; on_overwrite=full re-emits the snapshot."""
    import pytest as _pytest

    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a")]), root)
    versioned.commit_version(d([(9, "z")]), root, mode="overwrite")

    def run(out, ckpt, **opts):
        reader = spark.readStream.format("zone_changes").option("root", root)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / out))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    with _pytest.raises(Exception, match="on_overwrite"):
        run("s1", "c1")
    run("s2", "c2", on_overwrite="full")
    got = sorted(
        (r.k, r._commit_version)
        for r in spark.read.parquet(str(tmp_path / "s2")).collect()
    )
    assert got == [(1, 0), (9, 1)]


def test_zone_roundtrip_stream_in_stream_out(spark, tmp_path):
    """The full loop: an upstream stream commits micro-batches into the
    versioned zone (versioned_batch_writer, exactly-once), and a
    DOWNSTREAM stream tails the same zone via zone_changes — every
    committed row arrives exactly once, tagged with the commit that
    produced it."""
    import os as _os

    from realtime_data_pipeline_spark import streaming, versioned

    pysource.register(spark)
    inbox = str(tmp_path / "inbox")
    _os.makedirs(inbox)
    for i, rows in enumerate([[(1, "a"), (2, "b")], [(3, "c")]]):
        with open(_os.path.join(inbox, f"b{i}.csv"), "w") as f:
            f.write("k,v\n")
            for k, v in rows:
                f.write(f"{k},{v}\n")
        _os.utime(inbox + f"/b{i}.csv", (1_700_000_000 + i,) * 2)

    root = str(tmp_path / "zone")
    up = (
        streaming.read_file_stream(
            spark, inbox, "k long, v string", max_files_per_trigger=1
        )
        .writeStream.foreachBatch(versioned.versioned_batch_writer(root))
        .option("checkpointLocation", str(tmp_path / "up_ck"))
        .trigger(availableNow=True)
        .start()
    )
    up.awaitTermination(120)
    assert versioned.versions(root) == [0, 1]

    out = str(tmp_path / "down_sink")
    down = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "down_ck"))
        .start()
    )
    try:
        down.processAllAvailable()
    finally:
        down.stop()
    got = sorted(
        (r.k, r.v, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]


@pytest.mark.slow
def test_zone_changes_paces_backlog(spark, tmp_path):
    """max_versions_per_trigger bounds catch-up batches (from the second
    trigger on): 4 pending commits with a cap of 1 drain as separate
    micro-batches, all rows still exactly once."""
    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    d = lambda k: spark.createDataFrame([(k, "x")], "k long, v string")  # noqa: E731
    versioned.commit_version(d(0), root)

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .option("max_versions_per_trigger", 1)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # drains v0, sets the pacing cursor
        for k in range(1, 4):  # a 3-commit backlog accumulates
            versioned.commit_version(d(k), root, mode="append")
        q.processAllAvailable()
        batch_rows = [
            p["numInputRows"] for p in q.recentProgress if p["numInputRows"]
        ]
    finally:
        q.stop()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3]
    # the backlog drains one commit (one row) per trigger, never a
    # 3-commit gulp
    assert max(batch_rows) == 1 and len(batch_rows) == 4


@pytest.mark.slow
def test_zone_changes_full_reemit_aligns_by_name(spark, tmp_path):
    """on_overwrite=full across a schema-evolving overwrite: old files
    are read BY NAME against the latest declared schema — reordered
    columns land correctly and the added column NULL-pads, never a
    positional misalignment."""
    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], "k long, v string"), root
    )
    # overwrite evolves the schema AND reorders the shared columns
    versioned.commit_version(
        spark.createDataFrame(
            [("b", 2.5, 2)], "v string, w double, k long"
        ),
        root,
        mode="overwrite",
    )
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .option("on_overwrite", "full")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.v, r.w, r.k, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [("a", None, 1, 0), ("b", 2.5, 2, 1)]


@pytest.mark.slow
def test_zone_changes_checkpoint_behind_vacuum_surfaces_resync(
    spark, tmp_path
):
    """Torture: a vacuum racing a stopped zone_changes consumer. If the
    vacuum's retention window passes the consumer's checkpointed
    version, the restart must fail LOUDLY with the documented resync
    guidance ("vacuumed ... resync"), never silently replay the oldest
    surviving snapshot as fresh inserts (double-apply downstream). A
    vacuum that keeps the checkpoint in-window must not disturb the
    restart at all."""
    import pytest as _pytest

    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(0, "a")]), root)                 # v0
    versioned.commit_version(d([(1, "b")]), root, mode="append")  # v1

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run() -> None:
        q = (
            spark.readStream.format("zone_changes")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()  # checkpoint now at v1

    # in-window vacuum: v1 (the checkpointed offset) survives, restart
    # drains the backlog normally
    versioned.commit_version(d([(2, "c")]), root, mode="append")  # v2
    versioned.commit_version(d([(3, "d")]), root, mode="append")  # v3
    versioned.vacuum(root, keep_last=3, min_age_s=0.0)  # keeps v1..v3
    run()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3]

    # out-of-window vacuum: the checkpoint (v3) predates retention
    versioned.commit_version(d([(4, "e")]), root, mode="append")  # v4
    versioned.commit_version(d([(5, "f")]), root, mode="append")  # v5
    versioned.vacuum(root, keep_last=1, min_age_s=0.0)  # keeps only v5
    with _pytest.raises(Exception, match="vacuumed|resync"):
        run()
    # and nothing was silently appended to the sink by the failed run
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3]


@pytest.mark.slow
def test_zone_changes_restart_across_compaction(spark, tmp_path):
    """Torture: a compactor racing a stopped zone_changes consumer.
    compact_snapshot publishes an OVERWRITE commit, which is not
    expressible as an append feed: the default on_overwrite=fail must
    stop the restarted stream with the policy guidance, and
    on_overwrite=full must re-emit the compacted snapshot exactly once
    (dedupable downstream), not lose it or crash."""
    import pytest as _pytest

    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    d = lambda pairs: spark.createDataFrame(pairs, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(0, "a")]), root)                 # v0
    versioned.commit_version(d([(1, "b")]), root, mode="append")  # v1

    def run(out, ckpt, **opts):
        reader = (
            spark.readStream.format("zone_changes").option("root", root)
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / out))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run("s1", "c1")  # checkpoint at v1
    run("s2", "c2", on_overwrite="full")  # second consumer, same zone

    versioned.compact_snapshot(spark, root, target_partitions=1)  # v2

    with _pytest.raises(Exception, match="on_overwrite"):
        run("s1", "c1")
    run("s2", "c2", on_overwrite="full")
    got = sorted(
        (r.k, r._commit_version)
        for r in spark.read.parquet(str(tmp_path / "s2")).collect()
    )
    # v0+v1 as appends, then the compacted snapshot re-emitted at v2
    assert got == [(0, 0), (0, 2), (1, 1), (1, 2)]


@pytest.mark.slow
def test_zone_changes_where_prunes_files_and_filters_rows(spark, tmp_path):
    """zone_changes predicate pushdown: the where option is a real row
    filter AND skips provably-dead files at planning — proven by
    CORRUPTING the out-of-range commit's data file: if pruning works the
    stream never opens it; if pruning silently broke, the read crashes
    instead of delivering wrong results."""
    import json
    import os

    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    mk = lambda lo: spark.range(lo, lo + 100).toDF("k").coalesce(1)  # noqa: E731
    versioned.commit_version(mk(0), root)                    # v0: 0-99
    versioned.commit_version(mk(100), root, mode="append")   # v1: 100-199
    versioned.commit_version(mk(200), root, mode="append")   # v2: 200-299

    # v0's file is out of range for k >= 150 — garble it
    v0_file = os.path.join(
        root, versioned._read_manifest(root, 0)["files"][0]
    )
    with open(v0_file, "wb") as f:
        f.write(b"not parquet anymore")

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .option("where", json.dumps([["k", ">=", 150]]))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    # v1's file straddles the predicate: rows 150-199 pass the
    # executor-side filter; v2 passes whole; v0 was never opened
    assert got == list(range(150, 300))

    # a predicate on an unknown column fails loudly at source setup
    import pytest as _pytest

    with _pytest.raises(Exception, match="bad where predicate"):
        q2 = (
            spark.readStream.format("zone_changes")
            .option("root", root)
            .option("where", json.dumps([["nope", "=", 1]]))
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()

    # a type-mismatched literal (string vs the bigint column) fails at
    # stream DEFINITION too — not executor-side in pyarrow compute on
    # the first non-empty micro-batch
    with _pytest.raises(Exception, match="bad where predicate"):
        q3 = (
            spark.readStream.format("zone_changes")
            .option("root", root)
            .option("where", json.dumps([["k", ">", "oops"]]))
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .start()
        )
        try:
            q3.processAllAvailable()
        finally:
            q3.stop()


@pytest.mark.slow
def test_zone_changes_where_nan_rows_match_spark_semantics(spark, tmp_path):
    """NaN ordering parity: Spark SQL treats NaN as larger than every
    value, so a `where [[x, >, v]]` stream must DELIVER NaN rows — the
    raw pyarrow comparison (IEEE: NaN matches nothing) is corrected in
    read(). The filtered stream equals read_version_where exactly."""
    import json
    import math

    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 5.0), (4, None)],
        "k bigint, x double",
    )
    versioned.commit_version(df.coalesce(1), root)

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .option("where", json.dumps([["x", ">", 3.0]]))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    want = sorted(
        r.k
        for r in versioned.read_version_where(
            spark, root, [("x", ">", 3.0)]
        ).collect()
    )
    # NaN row (k=2) in, NULL row (k=4) out — on both paths
    assert got == want == [2, 3]
    nan_x = [
        r.x for r in spark.read.parquet(out).filter("k = 2").collect()
    ]
    assert len(nan_x) == 1 and math.isnan(nan_x[0])


def test_zone_changes_bloom_prunes_point_lookup_files(spark, tmp_path):
    """zone_changes consults the manifest's bloom sidecars too: on a
    high-cardinality column whose per-file [min, max] all overlap (so
    footer stats prove nothing), an equality `where` must still skip
    the files that cannot hold the key. Proven the same way as the
    stats test: CORRUPT every no-match file — if the bloom probe works
    the stream never opens them."""
    import json
    import os

    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    # file i holds ids ≡ i (mod 3): ranges all span ~[0, 300)
    for i in range(3):
        versioned.commit_version(
            spark.range(i, 300, 3).toDF("k").coalesce(1),
            root,
            mode="append",
            bloom_cols=["k"],
        )

    # k = 37 ≡ 1 (mod 3) lives only in commit 1's file — garble the rest
    for v in (0, 2):
        rel = [
            f
            for f in versioned._read_manifest(root, v)["files"]
            if f not in (
                versioned._read_manifest(root, v - 1)["files"] if v else []
            )
        ][0]
        with open(os.path.join(root, rel), "wb") as f:
            f.write(b"not parquet anymore")

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .option("where", json.dumps([["k", "=", 37]]))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [r.k for r in spark.read.parquet(out).collect()] == [37]


@pytest.mark.slow
def test_zone_changes_drives_continuous_rollup(spark, tmp_path):
    """CDC-driven incremental materialized view: the versioned zone's
    commit stream (zone_changes) feeds continuous_rollup, so a per-window
    aggregate table stays current as COMMITS land — the Delta-Live-Tables
    shape from two already-proven pieces, here pinned end-to-end. The
    merged rollup view equals the batch aggregate over the zone's latest
    snapshot after every catch-up run, including across a restart that
    picks up only the new commits (the rollup ingests each commit's rows
    exactly once via the checkpointed source offset + batch-scoped
    partial partitions)."""
    from realtime_data_pipeline_spark import streaming, versioned

    pysource.register(spark)
    root = str(tmp_path / "zone")
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def commit(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        versioned.commit_version(df, root, mode="append")

    def run_rollup():
        stream = (
            spark.readStream.format("zone_changes")
            .option("root", root)
            .load()
        )
        q = streaming.continuous_rollup(
            stream, "ts", "5 minutes", "value", out, ckpt
        )
        # availableNow terminates on its own; a fixed 120s bound proved
        # flaky under a loaded box (full-suite run at loadavg ~20), and
        # a silent timeout makes view() compare a half-ingested rollup
        assert q.awaitTermination(600), "rollup catch-up did not finish"

    def view():
        return {
            (str(r["window_start"]), r["n_events"], r["sum_value"])
            for r in streaming.rollup_view(spark, out).collect()
        }

    def batch_truth():
        snap = versioned.read_version(spark, root)
        agg = (
            snap.groupBy(F.window("ts", "5 minutes"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .select(
                F.col("window.start").alias("window_start"),
                "n_events", "sum_value"
            )
        )
        return {
            (str(r["window_start"]), r["n_events"], r["sum_value"])
            for r in agg.collect()
        }

    commit([(1, "2024-01-01 10:00:30", 10.0), (2, "2024-01-01 10:01:00", 5.0)])
    commit([(3, "2024-01-01 10:06:00", 7.0)])
    run_rollup()
    assert view() == batch_truth() and len(view()) == 2

    # new commits after the first catch-up: restart ingests ONLY them
    commit([(4, "2024-01-01 10:02:00", 1.0), (5, "2024-01-01 10:11:00", 2.0)])
    run_rollup()
    assert view() == batch_truth() and len(view()) == 3


@pytest.mark.slow
def test_zone_changes_delete_commit_is_noop_batch(spark, tmp_path):
    """An erasure commit (delete_keys) inserts nothing — the insert-only
    zone_changes stream must deliver a no-op batch for it under the
    DEFAULT (fail) policy, then keep streaming later appends normally."""
    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone_del_stream")
    d = lambda pairs: spark.createDataFrame(  # noqa: E731
        pairs, "k long, v string"
    ).coalesce(1)
    versioned.commit_version(d([(1, "a"), (2, "b")]), root)          # v0
    versioned.delete_keys(spark, root, "k", [2])                     # v1
    versioned.commit_version(d([(3, "c")]), root, mode="append")     # v2

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.k, r.v, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    # v0's two rows, v1 delivers nothing (no re-delivery of the
    # survivor file, no failure), v2's append flows through
    assert got == [(1, "a", 0), (2, "b", 0), (3, "c", 2)]

@pytest.mark.slow
def test_zone_changes_on_delete_fail_refuses_erasure_commits(spark, tmp_path):
    """on_delete='fail': a consumer that must PROPAGATE deletions (an
    insert-only mirror would silently retain erased rows) refuses the
    stream at the erasure commit instead of no-op'ing past it."""
    from realtime_data_pipeline_spark import versioned

    pysource.register(spark)
    root = str(tmp_path / "zone_del_fail")
    d = lambda pairs: spark.createDataFrame(  # noqa: E731
        pairs, "k long, v string"
    ).coalesce(1)
    versioned.commit_version(d([(1, "a"), (2, "b")]), root)          # v0
    versioned.delete_keys(spark, root, "k", [2])                     # v1

    q = (
        spark.readStream.format("zone_changes")
        .option("root", root)
        .option("on_delete", "fail")
        .load()
        .writeStream.format("memory")
        .queryName("zone_del_fail_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import pytest as _pytest

        with _pytest.raises(Exception, match="key-erasure"):
            q.processAllAvailable()
    finally:
        q.stop()

    # bad knob value fails at definition, not mid-stream
    import pytest as _pytest

    with _pytest.raises(Exception, match="on_delete"):
        (
            spark.readStream.format("zone_changes")
            .option("root", root)
            .option("on_delete", "bogus")
            .load()
            .writeStream.format("memory")
            .queryName("zone_del_bogus_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
            .processAllAvailable()
        )
