"""Round-17 isolate for the `streaming_interval_join_outer` 32-core
anomaly (VERDICT r16 #4: driver read 5.10 s at 32 cores vs 2.52 s at 8
in the same window; leg untouched by code).

Interleaves state-store providers (rocksdb | hdfs) over N reps in one
32-core session, bench-shaped leg, with a fixed-work multithreaded
calibration token around every rep so environment drift is separable
from provider effects. Prints one JSON line.

Usage: SSOJ_REPS=4 python scripts/ssoj_isolate.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from realtime_data_pipeline_spark import streaming
from realtime_data_pipeline_spark.session import get_spark, set_state_store


def _mt_token(n_threads: int = 8, iters: int = 200_000) -> float:
    def spin() -> int:
        x = 0
        for i in range(iters):
            x += i * i
        return x

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        list(pool.map(lambda _: spin(), range(n_threads)))
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    reps = int(os.environ.get("SSOJ_REPS", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ssoj-isolate")
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def leg_once() -> float:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            with tempfile.TemporaryDirectory() as td:
                inbox = os.path.join(td, "inbox")
                os.makedirs(inbox)
                shutil.copy(
                    f"{sf_dir}/events.parquet",
                    os.path.join(inbox, "events.parquet"),
                )
                t0 = time.perf_counter()
                src = streaming.read_file_stream(
                    spark, inbox, ev_schema, fmt="parquet",
                    max_files_per_trigger=1,
                )
                clicks = src.filter(
                    F.col("event_type") == "click"
                ).select(
                    F.col("event_id").alias("click_id"),
                    F.col("ts").cast("timestamp").alias("click_ts"),
                    F.col("user_id").alias("cuser"),
                )
                purchases = src.filter(
                    F.col("event_type") == "purchase"
                ).select(
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").cast("timestamp").alias("purchase_ts"),
                    F.col("user_id").alias("puser"),
                )
                joined = streaming.interval_join_stream(
                    clicks, purchases, "cuser", "puser",
                    "click_ts", "purchase_ts", "10 minutes",
                    how="full_outer",
                ).select("click_id", "purchase_id")
                sq = (
                    joined.writeStream.format("parquet")
                    .option("path", os.path.join(td, "out"))
                    .option(
                        "checkpointLocation", os.path.join(td, "ckpt")
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                assert sq.awaitTermination(300)
                return time.perf_counter() - t0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    out: dict[str, list] = {"rocksdb": [], "hdfs": [], "mt": []}
    # warm both providers once
    for prov in ("rocksdb", "hdfs"):
        set_state_store(spark, prov)
        leg_once()
    for _ in range(reps):
        for prov in ("rocksdb", "hdfs"):
            set_state_store(spark, prov)
            out[prov].append(round(leg_once(), 3))
            out["mt"].append(_mt_token())
    set_state_store(spark, "rocksdb")  # restore the default
    summary = {
        k: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
        for k, v in out.items()
        if v
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
