"""S4 fetch utility + the runnable bronze/silver CLI (exit-code parity
with the reference's gate)."""

from __future__ import annotations

import pytest


def test_fetch_to_raw_file_url(tmp_path):
    from realtime_data_pipeline_spark.sources import fetch_to_raw

    src = tmp_path / "src.bin"
    src.write_bytes(b"parquet-bytes-stand-in")
    dest = tmp_path / "raw" / "data.bin"
    out = fetch_to_raw(src.as_uri(), dest)
    assert out.read_bytes() == b"parquet-bytes-stand-in"
    # skip-if-exists: a source change must NOT trigger a re-fetch
    src.write_bytes(b"changed")
    out2 = fetch_to_raw(src.as_uri(), dest)
    assert out2.read_bytes() == b"parquet-bytes-stand-in"
    assert not (tmp_path / "raw" / "data.bin.part").exists()


@pytest.fixture()
def raw_events(spark, tmp_path):
    path = str(tmp_path / "raw")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (2, "2024-01-01 11:00:00", -2.0),
            (3, "2024-01-02 10:00:00", 7.0),
        ],
        "`Event ID` long, `TS` string, `Value` double",
    ).selectExpr("`Event ID`", "CAST(TS AS TIMESTAMP) AS `TS`", "`Value`")
    df.write.mode("overwrite").parquet(path)
    return path


def test_cli_bronze_then_silver_gate(raw_events, tmp_path, capsys):
    from realtime_data_pipeline_spark import cli

    bronze = str(tmp_path / "bronze")
    rc = cli.main([
        "bronze", "--raw", raw_events, "--bronze", bronze,
        "--ts-col", "ts", "--keep-cols", "event_id,ts,value",
    ])
    assert rc == 0
    # gate fails on the negative value (exit 2, reference parity)
    rc = cli.main([
        "silver", "--bronze", bronze,
        "--silver", str(tmp_path / "silver"),
        "--quarantine", str(tmp_path / "quarantine"),
    ])
    assert rc == 2
    # warn-only passes and still writes both outputs
    rc = cli.main([
        "silver", "--bronze", bronze,
        "--silver", str(tmp_path / "silver"),
        "--quarantine", str(tmp_path / "quarantine"),
        "--warn-only",
    ])
    assert rc == 0


def test_cli_pipeline_end_to_end(spark, tmp_path):
    """The one-command daily run: fetch >> bronze >> DQ silver, exit 2 on
    gate failure, 0 with --warn-only (run_full_pipeline.ps1 parity)."""
    import pathlib

    from realtime_data_pipeline_spark import cli

    # single-file source so the fetched file is guaranteed to contain the
    # violating row (raw_events may split rows across part files)
    import pyarrow as pa
    import pyarrow.parquet as pq

    single = tmp_path / "src.parquet"
    pq.write_table(
        pa.table(
            {
                "Event ID": [1, 2],
                "TS": ["2024-01-01 10:00:00", "2024-01-01 11:00:00"],
                "Value": [5.0, -2.0],
            }
        ),
        single,
    )
    part = pathlib.Path(single)
    base = [
        "pipeline",
        "--source-url", part.as_uri(),
        "--root", str(tmp_path / "zones"),
        "--ts-col", "ts",
        "--keep-cols", "event_id,ts,value",
    ]
    # the fixture has a negative value -> gate trips
    assert cli.main(base) == 2
    assert cli.main([*base, "--warn-only"]) == 0
    # all zones materialized
    for zone in ("raw", "bronze", "silver", "quarantine", "artifacts"):
        assert (tmp_path / "zones" / zone).exists(), zone


def test_cli_replay_promotes(spark, tmp_path, capsys):
    from realtime_data_pipeline_spark import cli

    silver = str(tmp_path / "rs")
    quarantine = str(tmp_path / "rq")
    spark.createDataFrame(
        [(1, 10.0)], "event_id long, value double"
    ).write.parquet(silver)
    spark.createDataFrame(
        [(2, 3.0), (3, -1.0)], "event_id long, value double"
    ).write.parquet(quarantine)
    rc = cli.main(
        [
            "replay",
            "--quarantine", quarantine,
            "--silver", silver,
            "--rule", "neg:value < 0",
        ]
    )
    assert rc == 0
    assert "promoted 1" in capsys.readouterr().out
    assert spark.read.parquet(silver).count() == 2
    assert spark.read.parquet(quarantine).count() == 1


def test_cli_stream_then_replay_keeps_partition_layout(spark, tmp_path, capsys):
    """Regression (round-4 advisory, medium): chaining `stream` (which
    lands zones hive-partitioned by batch_id) with `replay` must keep the
    batch_id layout — auto-detected from the quarantine directory — not
    append flat files to the silver root (mixed layouts break Spark
    partition discovery on the next read)."""
    import os

    from realtime_data_pipeline_spark import cli

    inbox = str(tmp_path / "sr_inbox")
    os.makedirs(inbox)
    # value<0 rule jails 2 and 4; rule was too strict, 2 should have passed
    with open(os.path.join(inbox, "b0.csv"), "w") as f:
        f.write("event_id,value\n1,10.0\n2,-5.0\n")
    with open(os.path.join(inbox, "b1.csv"), "w") as f:
        f.write("event_id,value\n3,1.0\n4,-70.0\n")
    silver = str(tmp_path / "srs")
    quarantine = str(tmp_path / "srq")
    rc = cli.main(
        [
            "stream",
            "--inbox", inbox,
            "--silver", silver,
            "--quarantine", quarantine,
            "--checkpoint", str(tmp_path / "src"),
            "--schema", "event_id long, value double",
            "--rule", "neg:value < 0",
            "--max-files-per-trigger", "1",
            "--timeout-sec", "120",
        ]
    )
    assert rc == 0
    assert any(d.startswith("batch_id=") for d in os.listdir(quarantine))

    # relaxed rule: only value < -10 is truly bad -> event 2 promotes
    rc = cli.main(
        [
            "replay",
            "--quarantine", quarantine,
            "--silver", silver,
            "--rule", "very_neg:value < -10",
        ]
    )
    assert rc == 0
    assert "promoted 1" in capsys.readouterr().out
    # silver root must stay purely batch_id-partitioned (no flat files)
    assert all(
        d.startswith(("batch_id=", "_", "."))  # _SUCCESS + .crc metadata
        for d in os.listdir(silver)
    )
    silver_df = spark.read.parquet(silver)  # would raise on mixed layout
    assert {r.event_id for r in silver_df.collect()} == {1, 2, 3}
    assert {r.event_id for r in spark.read.parquet(quarantine).collect()} == {4}


def test_cli_index_fp_build_then_merge(spark, tmp_path, capsys):
    """`index --kind fp`: first run seeds the fingerprint index from the
    corpus; the second run merges a batch whose duplicate is dropped and
    whose fresh doc lands in --fresh-out."""
    from realtime_data_pipeline_spark import cli

    corpus = str(tmp_path / "ix_corpus")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    ).write.parquet(corpus)
    batch = str(tmp_path / "ix_batch")
    spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta")], "doc_id long, text string"
    ).write.parquet(batch)
    idx = str(tmp_path / "ix_fp")
    fresh_out = str(tmp_path / "ix_fresh")

    rc = cli.main([
        "index", "--kind", "fp", "--index", idx, "--batch", corpus,
    ])
    assert rc == 0
    assert "2 fresh of 2" in capsys.readouterr().out

    rc = cli.main([
        "index", "--kind", "fp", "--index", idx, "--batch", batch,
        "--fresh-out", fresh_out,
    ])
    assert rc == 0
    assert "1 fresh of 2" in capsys.readouterr().out
    assert {r.doc_id for r in spark.read.parquet(fresh_out).collect()} == {11}


def test_cli_index_ivf_build_then_append(spark, tmp_path, capsys):
    """`index --kind ivf`: builds the cell-partitioned index on first
    run, appends with the STORED quantizer on the second."""
    import os

    from realtime_data_pipeline_spark import cli

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = str(tmp_path / "iv_corpus")
    batch = str(tmp_path / "iv_batch")
    emb.filter("vec_id % 10 != 0").write.parquet(corpus)
    emb.filter("vec_id % 10 = 0").write.parquet(batch)
    idx = str(tmp_path / "iv_idx")

    rc = cli.main([
        "index", "--kind", "ivf", "--index", idx, "--batch", corpus,
        "--id-col", "vec_id", "--centroids", "8",
    ])
    assert rc == 0
    assert "built 8 cells" in capsys.readouterr().out
    n_before = spark.read.parquet(f"{idx}/cells").count()

    rc = cli.main([
        "index", "--kind", "ivf", "--index", idx, "--batch", batch,
        "--id-col", "vec_id",
    ])
    assert rc == 0
    assert "appended" in capsys.readouterr().out
    total = emb.count()
    assert spark.read.parquet(f"{idx}/cells").count() == total
    assert n_before < total
    assert os.path.isdir(f"{idx}/centroids")


def test_cli_ingest_dedup_stream(spark, tmp_path, capsys):
    """`ingest` subcommand: cross-batch dedup against the persisted
    fingerprint index — only never-seen docs land in silver."""
    import os

    from realtime_data_pipeline_spark import cli

    inbox = str(tmp_path / "ig_inbox")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "b0.csv"), "w") as f:
        f.write("doc_id,text\n1,alpha alpha\n2,beta beta\n")
    with open(os.path.join(inbox, "b1.csv"), "w") as f:
        f.write("doc_id,text\n3,alpha alpha\n4,gamma gamma\n")
    for i, name in enumerate(["b0.csv", "b1.csv"]):
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(inbox, name), (t, t))
    silver = str(tmp_path / "ig_silver")
    rc = cli.main([
        "ingest",
        "--inbox", inbox,
        "--silver", silver,
        "--index", str(tmp_path / "ig_index"),
        "--checkpoint", str(tmp_path / "ig_ck"),
        "--schema", "doc_id long, text string",
        "--timeout-sec", "120",
    ])
    assert rc == 0
    assert "3 unique docs" in capsys.readouterr().out
    assert {r.doc_id for r in spark.read.parquet(silver).collect()} == {1, 2, 4}


@pytest.mark.slow
def test_cli_ingest_near_dedup(spark, tmp_path, capsys):
    """`ingest --near`: cross-batch NEAR-duplicates (one word changed)
    are dropped against the persisted signature index."""
    import os

    from realtime_data_pipeline_spark import cli

    base = " ".join(f"w{i}" for i in range(30))
    near = base.replace("w9", "CHANGED")
    inbox = str(tmp_path / "ign_inbox")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "b0.csv"), "w") as f:
        f.write(f"doc_id,text\n1,{base}\n")
    with open(os.path.join(inbox, "b1.csv"), "w") as f:
        f.write(f"doc_id,text\n2,{near}\n")
    for i, name in enumerate(["b0.csv", "b1.csv"]):
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(inbox, name), (t, t))
    silver = str(tmp_path / "ign_silver")
    rc = cli.main([
        "ingest", "--near",
        "--inbox", inbox,
        "--silver", silver,
        "--index", str(tmp_path / "ign_index"),
        "--checkpoint", str(tmp_path / "ign_ck"),
        "--schema", "doc_id long, text string",
        "--timeout-sec", "180",
    ])
    assert rc == 0
    assert "1 unique docs" in capsys.readouterr().out
    assert {r.doc_id for r in spark.read.parquet(silver).collect()} == {1}


@pytest.mark.slow
def test_cli_ingest_semantic_dedup(spark, tmp_path, capsys):
    """`ingest --semantic`: cross-batch embedding-space near-duplicates
    are dropped against the persisted kept-vector index (SemDeDup shape);
    novel directions land in silver."""
    import glob
    import os
    import shutil

    from realtime_data_pipeline_spark import cli

    schema = "vec_id long, embedding array<double>"
    inbox = str(tmp_path / "igs_inbox")
    os.makedirs(inbox)
    frames = [
        spark.createDataFrame(
            [(1, [1.0, 1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])], schema
        ),
        spark.createDataFrame(
            [(10, [0.99, 1.01, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])],
            schema,
        ),
    ]
    for i, frame in enumerate(frames):
        stage = str(tmp_path / f"igs_stage_{i}")
        frame.coalesce(1).write.parquet(stage)
        dst = os.path.join(inbox, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        t = 1_700_000_000 + i * 10
        os.utime(dst, (t, t))
    silver = str(tmp_path / "igs_silver")
    rc = cli.main([
        "ingest", "--semantic",
        "--inbox", inbox,
        "--silver", silver,
        "--index", str(tmp_path / "igs_index"),
        "--checkpoint", str(tmp_path / "igs_ck"),
        "--schema", schema,
        "--format", "parquet",
        "--id-col", "vec_id",
        "--tau", "0.9",
        "--bits", "2",
        "--timeout-sec", "120",
    ])
    assert rc == 0
    assert "3 unique docs" in capsys.readouterr().out
    # vec 10 (corpus dup of 1) dropped; novel direction 11 kept
    assert {
        r["vec_id"] for r in spark.read.parquet(silver).collect()
    } == {1, 2, 11}


def test_cli_rollup_catchup_with_distinct(spark, tmp_path, capsys):
    """`rollup` subcommand: inbox catch-up -> per-window partials ->
    merged view with HLL approx-distinct; --compact folds partials."""
    import os

    from realtime_data_pipeline_spark import cli, streaming

    inbox = str(tmp_path / "ru_inbox")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "b0.csv"), "w") as f:
        f.write("event_id,ts,user_id,value\n")
        for i in range(6):
            f.write(f"{i},2024-01-01 10:0{i}:00,{i % 2},1.0\n")
    with open(os.path.join(inbox, "b1.csv"), "w") as f:
        f.write("event_id,ts,user_id,value\n")
        for i in range(4):
            f.write(f"{10 + i},2024-01-01 10:0{i}:00,{i % 4},2.0\n")
    out = str(tmp_path / "ru_out")
    rc = cli.main(
        [
            "rollup",
            "--inbox", inbox,
            "--out", out,
            "--checkpoint", str(tmp_path / "ru_ck"),
            "--schema", "event_id long, ts timestamp, user_id long, value double",
            "--ts-col", "ts",
            "--value-col", "value",
            "--window", "5 minutes",
            "--distinct-col", "user_id",
            "--compact",
            "--timeout-sec", "120",
        ]
    )
    assert rc == 0
    out_text = capsys.readouterr().out
    assert "2 windows, 10 events" in out_text
    assert "compacted" in out_text
    assert streaming.rollup_partition_count(out) == 1
    view = {
        r.window_start.minute: (r.n_events, r.approx_distinct)
        for r in streaming.rollup_view(spark, out).collect()
    }
    # window 10:00-10:05 holds minutes 0-4 from both files: 9 events,
    # users {0,1} ∪ {0,1,2,3} = 4 distinct; 10:05+ holds 1 event, 1 user
    assert view[0] == (9, 4)
    assert view[5] == (1, 1)


def test_cli_maintain_retention_then_compact(spark, tmp_path, capsys):
    from realtime_data_pipeline_spark import cli, medallion

    tgt = str(tmp_path / "mt")
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in (1, 2, 3) for i in range(4)],
        "id long, d string",
    )
    # many small files per partition -> compaction has work to do
    medallion.write_parquet(
        df.repartition(4), tgt, partition_by="d", max_records_per_file=1
    )
    rc = cli.main(
        [
            "maintain", "--path", tgt, "--compact",
            "--partition-by", "d", "--retain-from", "2024-01-02",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "dropped 1 partitions" in out and "compact:" in out
    remaining = spark.read.parquet(tgt)
    assert remaining.count() == 8
    assert {str(r.d) for r in remaining.select("d").distinct().collect()} == {
        "2024-01-02", "2024-01-03",
    }


def test_cli_stream_gated_catchup(spark, tmp_path, capsys):
    import os

    from realtime_data_pipeline_spark import cli

    inbox = str(tmp_path / "cli_inbox")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "b0.csv"), "w") as f:
        f.write("event_id,value\n1,10.0\n2,-5.0\n3,1.0\n")
    rc = cli.main(
        [
            "stream",
            "--inbox", inbox,
            "--silver", str(tmp_path / "cs"),
            "--quarantine", str(tmp_path / "cq"),
            "--checkpoint", str(tmp_path / "cc"),
            "--schema", "event_id long, value double",
            "--rule", "neg:value < 0",
            "--timeout-sec", "120",
        ]
    )
    assert rc == 0
    assert "2 clean rows" in capsys.readouterr().out
    assert spark.read.parquet(str(tmp_path / "cq")).count() == 1


def test_cli_stream_with_redaction(spark, tmp_path):
    import os

    from realtime_data_pipeline_spark import cli

    inbox = str(tmp_path / "red_inbox")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "b0.csv"), "w") as f:
        f.write("event_id,value,note\n")
        f.write('1,10.0,reach me at bob@example.com ok\n')
        f.write("2,-5.0,quarantined raw\n")
    rc = cli.main(
        [
            "stream",
            "--inbox", inbox,
            "--silver", str(tmp_path / "rs2"),
            "--quarantine", str(tmp_path / "rq2"),
            "--checkpoint", str(tmp_path / "rc2"),
            "--schema", "event_id long, value double, note string",
            "--rule", "neg:value < 0",
            "--redact-text-col", "note",
            "--timeout-sec", "120",
        ]
    )
    assert rc == 0
    silver = {r.event_id: r.note for r in spark.read.parquet(str(tmp_path / "rs2")).collect()}
    assert silver == {1: "reach me at [EMAIL] ok"}


def test_cli_synth_generates_parquet(spark, tmp_path):
    from realtime_data_pipeline_spark import cli

    out = str(tmp_path / "synth_events")
    rc = cli.main(
        ["synth", "--out", out, "--rows", "500", "--partitions", "4"]
    )
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() == 500
    assert df.select("event_id").distinct().count() == 500


def test_cli_timetravel_log_rollback_vacuum(spark, tmp_path, capsys):
    from realtime_data_pipeline_spark import cli, versioned

    root = str(tmp_path / "tt_zone")
    versioned.commit_version(spark.range(100).toDF("id"), root)
    versioned.commit_version(
        spark.range(5).toDF("id"), root, mode="overwrite"
    )

    assert cli.main(["timetravel", "log", "--root", root]) == 0
    out = capsys.readouterr().out
    assert "v0" in out and "v1" in out

    assert cli.main(["timetravel", "rollback", "--root", root, "--to", "0"]) == 0
    assert versioned.read_version(spark, root).count() == 100

    assert cli.main(
        ["timetravel", "vacuum", "--root", root, "--keep-last", "1",
         "--min-age-sec", "0"]
    ) == 0
    assert versioned.versions(root) == [2]


def test_cli_timetravel_prune_reports_stats_skipping(
    spark, tmp_path, capsys
):
    """prune: --where predicates parse (int literal), the report counts
    files the footer stats prove out, and bad predicates fail loudly."""
    import json

    from realtime_data_pipeline_spark import cli, versioned

    root = str(tmp_path / "pz")
    for lo in (0, 100):
        versioned.commit_version(
            spark.range(lo, lo + 100).toDF("id").coalesce(1),
            root,
            mode="append",
        )
    assert cli.main(
        ["timetravel", "prune", "--root", root, "--where", "id<50"]
    ) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep == {
        "version": 1, "total_files": 2, "kept_files": 1,
        "skipped_files": 1,
    }
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="cannot parse"):
        cli.main(
            ["timetravel", "prune", "--root", root, "--where", "id!!5"]
        )
    with _pytest.raises(SystemExit, match="at least one"):
        cli.main(["timetravel", "prune", "--root", root])


@pytest.mark.slow
def test_cli_timetravel_prune_timestamp_literal_is_chronological(
    spark, tmp_path, capsys
):
    """The round-6 advisory scenario end to end: --where passes a raw
    SPACE-separated timestamp literal while the manifest stats are
    'T'-isoformat — pruning must compare chronologically (keep the
    matching file, still skip the provably-dead one), never
    lexicographically ('T' > ' ' would have pruned the match)."""
    import datetime
    import json

    from realtime_data_pipeline_spark import cli, versioned

    root = str(tmp_path / "tz")
    for day in (1, 60):  # one file of Jan 1 hours, one of Mar 1 hours
        base = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            days=day - 1
        )
        df = spark.createDataFrame(
            [(i, base + datetime.timedelta(hours=i)) for i in range(4)],
            "k long, ts timestamp",
        )
        versioned.commit_version(df.coalesce(1), root, mode="append")

    assert cli.main(
        ["timetravel", "prune", "--root", root,
         "--where", "ts<=2024-01-01 02:00:00"]
    ) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep == {
        "version": 1, "total_files": 2, "kept_files": 1,
        "skipped_files": 1,
    }


def test_cli_scd2_merge_current_asof(spark, tmp_path, capsys):
    """scd2 subcommand: two observation batches merge into a historized
    dimension; `current` shows the open segments and `asof` the state at
    a past timestamp."""
    import json

    from realtime_data_pipeline_spark import cli

    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    spark.createDataFrame(
        [("c1", "bronze", "2024-01-01 00:00:00")],
        "cust_id string, tier string, seen_at string",
    ).selectExpr(
        "cust_id", "tier", "CAST(seen_at AS timestamp) seen_at"
    ).write.parquet(b1)
    spark.createDataFrame(
        [("c1", "gold", "2024-02-01 00:00:00")],
        "cust_id string, tier string, seen_at string",
    ).selectExpr(
        "cust_id", "tier", "CAST(seen_at AS timestamp) seen_at"
    ).write.parquet(b2)

    tgt = str(tmp_path / "dim")
    base = ["scd2", "merge", "--target", tgt, "--keys", "cust_id",
            "--effective", "seen_at", "--buckets", "4"]
    assert cli.main([*base, "--batch", b1]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["initial_load"] is True
    assert cli.main([*base, "--batch", b2]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["initial_load"] is False and m2["rows_written"] == 2

    assert cli.main(["scd2", "current", "--target", tgt]) == 0
    out = capsys.readouterr().out
    assert "gold" in out and "bronze" not in out

    assert cli.main(
        ["scd2", "asof", "--target", tgt, "--at", "2024-01-15 00:00:00"]
    ) == 0
    out = capsys.readouterr().out
    assert "bronze" in out and "gold" not in out


def test_cli_profile_prints_column_stats(spark, tmp_path, capsys):
    from realtime_data_pipeline_spark import cli

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "x"), (2, None)], "id long, s string"
    ).write.parquet(p)
    assert cli.main(["profile", "--path", p, "--exact-ndv"]) == 0
    out = capsys.readouterr().out
    assert "null_frac" in out and "ndv" in out
    assert "id" in out and "s" in out


def test_cli_timetravel_changes(spark, tmp_path, capsys):
    from realtime_data_pipeline_spark import cli, versioned

    root = str(tmp_path / "zone")
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], "k long, v string"), root
    )
    versioned.commit_version(
        spark.createDataFrame([(2, "b")], "k long, v string"),
        root, mode="append",
    )
    assert cli.main(
        ["timetravel", "changes", "--root", root, "--version", "1"]
    ) == 0
    out = capsys.readouterr().out
    assert "insert" in out and "b" in out and "a " not in out


def test_cli_scd2_stream_from_zone(spark, tmp_path, capsys):
    """`scd2 stream --zone`: commits of observation batches tail into
    the historized dimension via the zone_changes source."""
    from realtime_data_pipeline_spark import cli, medallion, versioned

    root = str(tmp_path / "obs_zone")
    obs = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "cust_id string, tier string, seen_at timestamp"
    )
    import datetime as dt

    versioned.commit_version(
        obs([("c1", "bronze", dt.datetime(2024, 1, 1))]), root
    )
    versioned.commit_version(
        obs([("c1", "gold", dt.datetime(2024, 2, 1))]), root, mode="append"
    )
    dim = str(tmp_path / "dim")
    rc = cli.main([
        "scd2", "stream", "--target", dim, "--zone", root,
        "--keys", "cust_id", "--effective", "seen_at",
        "--checkpoint", str(tmp_path / "ck"), "--buckets", "4",
        "--timeout-sec", "300",
    ])
    assert rc == 0
    cur = {r.cust_id: r.tier for r in medallion.scd2_current(spark, dim).collect()}
    assert cur == {"c1": "gold"}
    assert spark.read.parquet(dim).count() == 2


def test_cli_scd2_enrich_attributes_facts(spark, tmp_path, capsys):
    """scd2 enrich: a facts CSV inbox streams through the point-in-time
    join against the dimension; each fact lands with the tier in force
    at its own event time."""
    import os

    from realtime_data_pipeline_spark import cli

    b1 = str(tmp_path / "b1")
    spark.createDataFrame(
        [
            ("c1", "bronze", "2024-01-01 00:00:00"),
            ("c1", "gold", "2024-02-01 00:00:00"),
        ],
        "cust_id string, tier string, seen_at string",
    ).selectExpr(
        "cust_id", "tier", "CAST(seen_at AS timestamp) seen_at"
    ).write.parquet(b1)
    tgt = str(tmp_path / "dim")
    assert cli.main(
        ["scd2", "merge", "--target", tgt, "--keys", "cust_id",
         "--effective", "seen_at", "--buckets", "4", "--batch", b1]
    ) == 0
    capsys.readouterr()

    inbox = str(tmp_path / "facts")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "f0.csv"), "w") as f:
        f.write("cust_id,amount,ts\n")
        f.write("c1,10.0,2024-01-15T00:00:00\n")  # bronze era
        f.write("c1,20.0,2024-02-15T00:00:00\n")  # gold era
    out = str(tmp_path / "enriched")
    assert cli.main(
        ["scd2", "enrich", "--target", tgt, "--inbox", inbox,
         "--format", "csv",
         "--schema", "cust_id string, amount double, ts timestamp",
         "--keys", "cust_id", "--ts-col", "ts", "--out", out,
         "--checkpoint", str(tmp_path / "ck")]
    ) == 0
    got = sorted(
        (r.amount, r.tier) for r in spark.read.parquet(out).collect()
    )
    assert got == [(10.0, "bronze"), (20.0, "gold")]


def test_cli_assemble_builds_shuffled_packed_shards(spark, tmp_path, capsys):
    """assemble: curated docs -> hash-split train side -> reproducible
    shard shuffle -> packing manifest, written shard-partitioned; two
    runs produce identical manifests (replay-deterministic)."""
    import os

    from realtime_data_pipeline_spark import cli

    docs = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).write.parquet(docs)

    def run(out):
        rc = cli.main(
            ["assemble", "--docs", docs, "--out", out,
             "--shards", "4", "--ctx-len", "256"]
        )
        assert rc == 0
        return sorted(
            map(tuple, spark.read.parquet(out)
                .select("doc_id", "shard", "shard_pos", "offset")
                .collect())
        )

    a = run(str(tmp_path / "o1"))
    b = run(str(tmp_path / "o2"))
    assert a == b and len(a) > 0
    # shard-partitioned layout on disk
    assert any(
        d.startswith("shard=") for d in os.listdir(str(tmp_path / "o1"))
    )
    # train side only: eval docs (md5 nibble > 'c') are absent
    ids = {r[0] for r in a}
    evals = {
        r.doc_id
        for r in spark.read.parquet(docs)
        .where("substring(md5(text), 1, 1) > 'c'")
        .collect()
    }
    assert not (ids & evals)


def test_cli_assemble_rejects_shard_band_overflow(spark, tmp_path):
    """--shards >= 1000 would overflow the stage-major composite order's
    1e9-wide shard band (stage*1e12 + shard*1e9 + pos) and silently
    interleave stages — the CLI refuses before reading anything."""
    import pytest as _pytest

    from realtime_data_pipeline_spark import cli

    with _pytest.raises(SystemExit, match="shards must be < 1000"):
        cli.main(
            ["assemble", "--docs", "/nonexistent", "--out",
             str(tmp_path / "o"), "--shards", "1000"]
        )


@pytest.mark.slow
def test_cli_assemble_link_rank_culls_low_rank_docs(spark, tmp_path):
    """assemble --link-edges: PageRank over the provided edge list
    demotes link-poor documents — a hub with many in-links survives a
    high cutoff, leaf docs that only point at it are culled, and docs
    OUTSIDE the graph pass through untouched (no link evidence)."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import cli

    docs = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 60).write.parquet(docs)

    # chain+star over docs 0-39: every node links to hub 0 AND to its
    # chain successor, so rank rises monotonically along the chain (node
    # 1 has no in-links = minimum rank, hub 0 collects everything =
    # maximum); docs 40-59 are outside the graph entirely
    edges = str(tmp_path / "edges")
    chain = spark.range(1, 39).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    star = spark.range(1, 40).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    chain.unionByName(star).write.parquet(edges)

    out = str(tmp_path / "ranked")
    rc = cli.main(
        ["assemble", "--docs", docs, "--out", out, "--shards", "2",
         "--ctx-len", "256", "--split", "all",
         "--link-edges", edges, "--min-rank-pct", "50"]
    )
    assert rc == 0
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 0 in kept and 39 in kept  # hub + chain tail outrank the median
    assert 1 not in kept and 2 not in kept  # chain head ranks lowest
    assert len(kept & set(range(40))) < 40  # the cull actually binds
    assert set(range(40, 60)) <= kept  # ungraphed docs pass through


def test_cli_assemble_strip_boilerplate_shrinks_token_budget(spark, tmp_path):
    """assemble --strip-boilerplate: shared spans are rewritten out
    before the split/pack, so every doc survives but the packed token
    budget shrinks vs the unstripped run on the same corpus."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import cli

    hdr = "all rights reserved contact legal department before reuse"
    docs = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        F.concat(F.lit(hdr + " "), F.col("text")).alias("text"),
    ).filter(F.col("doc_id") < 40).write.parquet(docs)

    def run(out, extra):
        rc = cli.main(
            ["assemble", "--docs", docs, "--out", out, "--shards", "2",
             "--ctx-len", "256", "--split", "all", *extra]
        )
        assert rc == 0
        return spark.read.parquet(out)

    plain = run(str(tmp_path / "plain"), [])
    stripped = run(str(tmp_path / "stripped"), ["--strip-boilerplate"])
    assert stripped.count() == plain.count()  # cleaned, never dropped
    t_plain = plain.agg(F.sum("n_tokens")).first()[0]
    t_stripped = stripped.agg(F.sum("n_tokens")).first()[0]
    # every doc lost at least the 8-token header
    assert t_plain - t_stripped >= 8 * plain.count()


def test_cli_assemble_semantic_dedup_drops_dominated_docs(spark, tmp_path):
    """assemble --embeddings: a document whose embedding has a similar
    smaller-id bucket-mate is dropped before the split (SemDeDup);
    dissimilar docs and docs WITHOUT an embedding row pass through."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import cli

    docs = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 30).write.parquet(docs)

    # ids 0-9: mutually-orthogonal one-hots (all dims >= 0 → one orthant
    # bucket, pairwise cosine 0 → all kept); id 25 is a near-copy of
    # id 5's embedding → semantically dominated; ids 10-24 and 26-29
    # have no embedding at all and must pass through
    def onehot(i):
        return [1.0 if d == i else 0.0 for d in range(8)]

    emb = [(i, onehot(i)) for i in range(10)]
    emb.append((25, [0.01 if d == 0 else (0.99 if d == 5 else 0.0)
                     for d in range(8)]))
    embeddings = str(tmp_path / "emb")
    spark.createDataFrame(
        emb, "vec_id long, embedding array<double>"
    ).write.parquet(embeddings)

    out = str(tmp_path / "dedup")
    rc = cli.main(
        ["assemble", "--docs", docs, "--out", out, "--shards", "2",
         "--ctx-len", "256", "--split", "all",
         "--embeddings", embeddings, "--semdedup-tau", "0.9"]
    )
    assert rc == 0
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == set(range(30)) - {25}


def test_cli_stream_strip_boilerplate_cleans_clean_side(spark, tmp_path):
    """stream --strip-boilerplate: the in-stream curation stage rewrites
    batch-repeated spans out of the text column on the clean side."""
    import os

    from realtime_data_pipeline_spark import cli

    hdr = "subscribe to our newsletter today unsubscribe anytime"
    inbox = str(tmp_path / "sbx")
    os.makedirs(inbox)
    spark.createDataFrame(
        [(i, f"{hdr} story{i}a story{i}b story{i}c", 1.0) for i in range(3)],
        "doc_id long, text string, value double",
    ).coalesce(1).write.parquet(os.path.join(inbox, "b0"))
    # file-source inbox is a flat dir of files
    import glob
    import shutil

    part = glob.glob(os.path.join(inbox, "b0", "part-*.parquet"))[0]
    shutil.move(part, os.path.join(inbox, "b0.parquet"))
    shutil.rmtree(os.path.join(inbox, "b0"))

    silver = str(tmp_path / "sbs")
    rc = cli.main(
        [
            "stream",
            "--inbox", inbox,
            "--silver", silver,
            "--quarantine", str(tmp_path / "sbq"),
            "--checkpoint", str(tmp_path / "sbc"),
            "--schema", "doc_id long, text string, value double",
            "--format", "parquet",
            "--rule", "neg:value < 0",
            "--redact-text-col", "text",
            "--strip-boilerplate",
        ]
    )
    assert rc == 0
    got = {r.doc_id: r.text for r in spark.read.parquet(silver).collect()}
    assert got == {
        i: f"story{i}a story{i}b story{i}c" for i in range(3)
    }


def test_cli_rollup_histogram_quantiles(spark, tmp_path, capsys):
    """`rollup --histogram LO:HI:BINS`: the catch-up run maintains
    mergeable per-window histogram partials; the view exposes
    approx_p50/approx_p95."""
    import os

    from realtime_data_pipeline_spark import cli, streaming

    inbox = str(tmp_path / "ruh_inbox")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "b0.csv"), "w") as f:
        f.write("event_id,ts,user_id,value\n")
        for i in range(20):
            f.write(f"{i},2024-01-01 10:00:{i:02d},1,{float(i)}\n")
    out = str(tmp_path / "ruh_out")
    rc = cli.main([
        "rollup",
        "--inbox", inbox,
        "--out", out,
        "--checkpoint", str(tmp_path / "ruh_ck"),
        "--ts-col", "ts",
        "--value-col", "value",
        "--window", "5 minutes",
        "--histogram", "0:20:40",
        "--schema", "event_id long, ts timestamp, user_id long, value double",
        "--timeout-sec", "120",
    ])
    assert rc == 0
    view = streaming.rollup_view(spark, out).collect()
    assert len(view) == 1
    row = view[0]
    # 20 uniform values in [0,20): p50 within one bin width (0.5) of 9
    assert abs(row["approx_p50"] - 9.0) <= 0.5 + 1e-9
    assert row["approx_p95"] >= row["approx_p50"]


def test_cli_timetravel_diff_prints_net_delta(spark, tmp_path, capsys):
    """`timetravel diff --from A --to B` prints the net row-level delta
    between two snapshots (versioned.diff_versions through the CLI)."""
    from realtime_data_pipeline_spark import cli, versioned

    root = str(tmp_path / "zone")
    d = lambda rows: spark.createDataFrame(rows, "k long, v string")  # noqa: E731
    versioned.commit_version(d([(1, "a")]), root)                 # v0
    versioned.commit_version(d([(2, "b")]), root, mode="append")  # v1
    assert (
        cli.main(
            ["timetravel", "diff", "--root", root, "--from", "0",
             "--to", "1"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "insert" in out and "2" in out and "delete" not in out.split(
        "_change_type"
    )[-1].replace("insert", "")
    import pytest

    with pytest.raises(SystemExit, match="--from and --to"):
        cli.main(["timetravel", "diff", "--root", root])


def test_cli_maintain_compact_stream_index(spark, tmp_path, capsys):
    """`maintain --compact-stream-index fp --path <index>` folds a
    streaming fingerprint index's batch partitions through the CLI."""
    import json
    import os

    from realtime_data_pipeline_spark import cli, streaming

    idx = str(tmp_path / "idx")
    silver = str(tmp_path / "silver")
    for bid, rows in enumerate(
        [[(1, "aaa"), (2, "bbb")], [(3, "ccc")]]
    ):
        streaming.dedup_ingest_batch(
            spark.createDataFrame(rows, "doc_id long, body string"),
            bid, idx, silver, "body", "doc_id",
        )
    assert (
        cli.main(
            ["maintain", "--path", idx, "--compact-stream-index", "fp"]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["batch_partitions_before"] == 2
    assert out["batch_partitions_after"] == 1
    assert [
        d for d in os.listdir(idx) if d.startswith("batch_id=")
    ] == ["batch_id=-1"]


def test_cli_assemble_curriculum_and_domain_cap(spark, tmp_path):
    """assemble --curriculum --domain-cap: the full curation chain in
    one invocation — at most N docs survive per source (deterministic
    md5-rank cap), every manifest row carries stage AND shard, shard
    positions are dense per (stage, shard), the packed token stream is
    stage-major (every stage-0 offset precedes every stage-1 offset),
    and the whole manifest is replay-deterministic."""
    import collections

    from realtime_data_pipeline_spark import cli

    docs = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "source"
    ).write.parquet(docs)
    cap = 5

    def run(out):
        rc = cli.main(
            ["assemble", "--docs", docs, "--out", out, "--shards", "4",
             "--ctx-len", "256", "--curriculum",
             "--domain-cap", str(cap), "--split", "all"]
        )
        assert rc == 0
        return sorted(
            map(tuple, spark.read.parquet(out)
                .select("doc_id", "stage", "shard", "shard_pos",
                        "offset", "source")
                .collect())
        )

    a = run(str(tmp_path / "o1"))
    assert a == run(str(tmp_path / "o2")) and len(a) > 0

    per_source = collections.Counter(r[5] for r in a)
    assert max(per_source.values()) <= cap
    assert {r[1] for r in a} <= {0, 1, 2}

    # dense positions per (stage, shard)
    groups = collections.defaultdict(list)
    for _, stage, shard, pos, _, _ in a:
        groups[(stage, shard)].append(pos)
    for g, positions in groups.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), g

    # stage-major packing: all of stage s's tokens precede stage s+1's
    stage_offsets = collections.defaultdict(list)
    for _, stage, _, _, offset, _ in a:
        stage_offsets[stage].append(offset)
    stages = sorted(stage_offsets)
    for lo, hi in zip(stages, stages[1:]):
        assert max(stage_offsets[lo]) < min(stage_offsets[hi])


def test_cli_timetravel_erase_deletes_keys(spark, tmp_path, capsys):
    """timetravel erase: the GDPR key-erasure commit through the CLI —
    doomed rows gone from latest, JSON result on stdout, int values
    parsed from the comma list."""
    import json as _json

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import cli, versioned

    root = str(tmp_path / "tt_erase")
    versioned.commit_version(
        spark.range(100).toDF("id").coalesce(1), root
    )
    assert cli.main(
        ["timetravel", "erase", "--root", root, "--col", "id",
         "--values", "7,11"]
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_deleted"] == 2
    latest = versioned.read_version(spark, root)
    assert latest.filter(F.col("id").isin([7, 11])).count() == 0
    assert latest.count() == 98
    # missing args are refused before any work
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="col and --values"):
        cli.main(["timetravel", "erase", "--root", root])


def test_cli_assemble_decontaminate_eval_removes_leaked_spans(
    spark, tmp_path
):
    """assemble --decontaminate-eval: a train doc carrying a passage
    from the eval table loses exactly that span before packing (docs
    survive, tokens shrink by at least the leak length per leaked doc);
    a run without the flag keeps the full budget."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import cli

    leak = "which river is the longest river on the african continent"
    docs = str(tmp_path / "docs")
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 40)
    base.select(
        "doc_id",
        F.when(
            F.col("doc_id") < 10,
            F.concat(F.lit(leak + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).write.parquet(docs)
    evals = str(tmp_path / "evals")
    spark.createDataFrame(
        [(1, f"exam question: {leak} answer below")],
        "qid long, text string",
    ).write.parquet(evals)

    def run(out, extra):
        rc = cli.main(
            ["assemble", "--docs", docs, "--out", out, "--shards", "2",
             "--ctx-len", "256", "--split", "all", *extra]
        )
        assert rc == 0
        return spark.read.parquet(out)

    plain = run(str(tmp_path / "plain"), [])
    clean = run(
        str(tmp_path / "clean"), ["--decontaminate-eval", evals]
    )
    assert clean.count() == plain.count()  # cleaned, never dropped
    t_plain = plain.agg(F.sum("n_tokens")).first()[0]
    t_clean = clean.agg(F.sum("n_tokens")).first()[0]
    # the 10 leaked docs each lose at least the 10-token leak
    assert t_plain - t_clean >= 10 * 10


@pytest.mark.slow
def test_cli_assemble_quality_model_gate(spark, tmp_path):
    """--quality-model: a saved logistic model scores documents map-only
    and drops those below the threshold before split/packing — the
    trained sibling of the heuristic quality band. Train a model that
    separates 'good'-family from 'junk'-family docs, assemble with the
    gate, and assert only the junk docs vanished."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import classifier, cli

    dim = 128
    rows = []
    for i in range(40):
        rows.append((i, f"good quality prose sample {i % 7} the and", 1))
        rows.append((100 + i, f"junk spam noise blob {i % 5} the and", 0))
    import pandas as pd

    docs_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "y"])
    )
    model = classifier.logreg_train(
        docs_df.withColumn(
            "x", classifier.hash_features(F.col("text"), dim, seed=41)
        ),
        "x", "y", dim=dim, iters=30,
    )
    mpath = str(tmp_path / "qmodel")
    classifier.save_logreg(spark, model, mpath)

    docs = str(tmp_path / "docs")
    docs_df.select("doc_id", "text").write.parquet(docs)
    out = str(tmp_path / "out")
    rc = cli.main(
        ["assemble", "--docs", docs, "--out", out, "--shards", "2",
         "--ctx-len", "256", "--split", "all",
         "--quality-model", mpath, "--quality-min-score", "0.5"]
    )
    assert rc == 0
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {i for i in range(40)}  # every good doc, no junk
