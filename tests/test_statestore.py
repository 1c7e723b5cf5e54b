"""Bounded-state soak for the streaming state-store providers.

The 100 TB posture for stateful streaming is (a) RocksDB state store —
disk-backed, bounded heap — instead of the default all-in-executor-heap
HDFS provider, and (b) watermark/timeout-driven state EVICTION, so state
is a sliding horizon, not an append-only map. These tests drive enough
keys through the two stateful operators (W5 dedup, W6 running count) to
watch `stateOperators.numRowsTotal` GROW while new keys arrive and
SHRINK after the watermark passes their horizon — under BOTH providers,
with identical query results. That turns the "RocksDB is one config
away" claim into a measured behavior.
"""

from __future__ import annotations

import datetime
import os

import pytest

from realtime_data_pipeline_spark import streaming
from realtime_data_pipeline_spark.session import (
    STATE_STORE_PROVIDERS,
    _STATE_STORE_CONF,
    set_state_store,
)

PROVIDERS = ("hdfs", "rocksdb")
BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _write_inbox(root: str, n_files: int = 5, keys_per_file: int = 100) -> str:
    """n_files CSV batches; each file has its own fresh key set (state
    must grow) duplicated once (dedup must drop), with event time
    advancing 30 min per file (a 10-min watermark passes each file's
    horizon two files later — state must shrink)."""
    inbox = os.path.join(root, "inbox")
    os.makedirs(inbox)
    for fidx in range(n_files):
        ts = (BASE + datetime.timedelta(minutes=30 * fidx)).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        p = os.path.join(inbox, f"f{fidx}.csv")
        with open(p, "w") as f:
            f.write("k,ts\n")
            for i in range(keys_per_file):
                f.write(f"k{fidx}_{i},{ts}\n")
                f.write(f"k{fidx}_{i},{ts}\n")  # exact duplicate
        # the file source orders batches by MODIFICATION TIME; quick
        # successive writes can tie — pin a strict event-time-aligned
        # order so the watermark advances monotonically per trigger
        os.utime(p, (1_700_000_000 + fidx * 10, 1_700_000_000 + fidx * 10))
    return inbox


def _run_stream(spark, out_df, checkpoint: str, name: str, output_mode=None):
    """availableNow run to completion; returns (collected rows, per-batch
    state-row totals)."""
    writer = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    if output_mode:
        writer = writer.outputMode(output_mode)
    sq = writer.start()
    assert sq.awaitTermination(300), "soak stream did not finish"
    rows = spark.sql(f"select * from {name}").collect()
    state = [
        so.numRowsTotal
        for p in sq.recentProgress
        for so in (p.stateOperators or [])
    ]
    return rows, state


@pytest.fixture()
def _restore_provider(spark):
    prev = spark.conf.get(_STATE_STORE_CONF, None)
    yield
    if prev is not None:
        spark.conf.set(_STATE_STORE_CONF, prev)


def _read_inbox_stream(spark, inbox: str):
    return (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .load(inbox)
    )


@pytest.mark.slow
def test_stream_dedup_bounded_state_both_providers(
    spark, tmp_path, _restore_provider
):
    """W5 soak: state grows while keys arrive inside the horizon, shrinks
    once the watermark passes — proven under BOTH providers — and the
    deduped output is identical (provider is an engine detail, never a
    semantic)."""
    inbox = _write_inbox(str(tmp_path))
    results = {}
    for provider in PROVIDERS:
        set_state_store(spark, provider)
        assert spark.conf.get(_STATE_STORE_CONF) == STATE_STORE_PROVIDERS[provider]
        dd = streaming.stream_dedup(
            _read_inbox_stream(spark, inbox), ["k"], "ts", watermark="10 minutes"
        )
        rows, state = _run_stream(
            spark, dd, str(tmp_path / f"cp_{provider}"), f"soak_{provider}"
        )
        # every duplicate dropped, every unique key kept
        assert len(rows) == 500
        # bounded-state proof: the store grew past one file's key set,
        # then watermark eviction brought it back down by the last batch
        assert max(state) > 100, state
        assert state[-1] < max(state), state
        results[provider] = sorted((r.k, r.ts) for r in rows)
    assert results["hdfs"] == results["rocksdb"]


@pytest.mark.slow
def test_interval_join_bounded_state_both_providers(
    spark, tmp_path, _restore_provider
):
    """J5 soak: stream-stream interval join state (both sides buffered
    until provably unmatchable) grows while batches arrive and shrinks
    once the watermark + interval bound passes — identical joined output
    under both providers."""
    clicks_dir = os.path.join(str(tmp_path), "clicks")
    buys_dir = os.path.join(str(tmp_path), "buys")
    os.makedirs(clicks_dir)
    os.makedirs(buys_dir)
    file_mtimes: list[tuple[str, int]] = []
    # 5 file-pairs; user u{f}_{i} clicks 1 min after their purchase, so
    # every click joins exactly one purchase inside the 10-min interval
    for fidx in range(5):
        t_buy = BASE + datetime.timedelta(minutes=30 * fidx)
        t_click = t_buy + datetime.timedelta(minutes=1)
        with open(os.path.join(clicks_dir, f"f{fidx}.csv"), "w") as f:
            f.write("ck,click_ts\n")
            for i in range(50):
                f.write(
                    f"u{fidx}_{i},{t_click.strftime('%Y-%m-%d %H:%M:%S')}\n"
                )
        with open(os.path.join(buys_dir, f"f{fidx}.csv"), "w") as f:
            f.write("bk,buy_ts\n")
            for i in range(50):
                f.write(
                    f"u{fidx}_{i},{t_buy.strftime('%Y-%m-%d %H:%M:%S')}\n"
                )
        for d in (clicks_dir, buys_dir):
            file_mtimes.append((os.path.join(d, f"f{fidx}.csv"), fidx))
    for p, fidx in file_mtimes:
        os.utime(p, (1_700_000_000 + fidx * 10, 1_700_000_000 + fidx * 10))
    results = {}
    for provider in PROVIDERS:
        set_state_store(spark, provider)
        clicks = (
            spark.readStream.format("csv")
            .option("header", "true")
            .schema("ck string, click_ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .load(clicks_dir)
        )
        buys = (
            spark.readStream.format("csv")
            .option("header", "true")
            .schema("bk string, buy_ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .load(buys_dir)
        )
        joined = streaming.interval_join_stream(
            clicks, buys, "ck", "bk", "click_ts", "buy_ts",
            max_delay="10 minutes", watermark="10 minutes",
        )
        rows, state = _run_stream(
            spark, joined, str(tmp_path / f"jcp_{provider}"), f"jsoak_{provider}"
        )
        assert len(rows) == 250  # every click matched its one purchase
        assert max(state) > 100, state  # >1 file-pair buffered at peak
        assert state[-1] < max(state), state  # eviction after watermark
        results[provider] = sorted((r.ck, r.click_ts, r.buy_ts) for r in rows)
    assert results["hdfs"] == results["rocksdb"]


@pytest.mark.slow
def test_running_count_expiry_bounded_state(spark, tmp_path, _restore_provider):
    """W6 soak on RocksDB: with expire_after_ms set, per-key state carries
    an event-time timeout; keys idle past the horizon are REMOVED (state
    shrinks) instead of accumulating forever. Counts within each key's
    live horizon stay exact."""
    inbox = _write_inbox(str(tmp_path), n_files=5, keys_per_file=50)
    set_state_store(spark, "rocksdb")
    rc = streaming.running_count_per_key(
        _read_inbox_stream(spark, inbox),
        ["k"],
        "ts",
        watermark="10 minutes",
        expire_after_ms=10 * 60 * 1000,
    )
    rows, state = _run_stream(
        spark, rc, str(tmp_path / "cp_rc"), "soak_rc", output_mode="update"
    )
    # each key saw 2 events (the duplicate pair) before its horizon passed
    per_key = {r.k: r.n_events for r in rows}
    assert set(per_key.values()) == {2}
    assert len(per_key) == 250
    # eviction proof: state covered >1 file's keys at peak, then shrank
    assert max(state) > 50, state
    assert state[-1] < max(state), state


def test_state_reader_exposes_checkpoint_state(spark, tmp_path):
    """The statestore/state-metadata sources read a checkpoint's state as
    DataFrames: the metadata names the operator, and the state rows must
    equal the same aggregation computed in batch over the same input —
    offline state debugging with zero JVM spelunking."""
    from pyspark.sql import functions as F

    inbox = _write_inbox(str(tmp_path), n_files=3, keys_per_file=20)
    ckpt = str(tmp_path / "ckpt_reader")
    counts = (
        _read_inbox_stream(spark, inbox)
        .groupBy("k")
        .count()
    )
    _run_stream(spark, counts, ckpt, "state_reader_counts", output_mode="update")

    meta = streaming.read_state_metadata(spark, ckpt)
    ops = {r["operatorName"] for r in meta.collect()}
    assert ops == {"stateStoreSave"}

    state = streaming.read_state(spark, ckpt)
    flat = state.select(
        F.col("key.k").alias("k"), F.col("value.count").alias("count")
    )
    batch = (
        spark.read.csv(inbox, header=True, schema="k string, ts timestamp")
        .groupBy("k")
        .count()
    )
    assert flat.exceptAll(batch).count() == 0
    assert batch.exceptAll(flat).count() == 0
