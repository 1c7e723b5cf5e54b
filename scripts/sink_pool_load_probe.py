"""Round-17 probe (VERDICT r16 #6): does the 2-thread sink pool still
win when the box is saturated? Times the dq-multibatch and dedup-ingest
legs with the pool at 2 (overlapped sinks) vs 1 (serialized),
interleaved, in two regimes: idle box and a 32-process spin load.
Prints one JSON line per regime.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from realtime_data_pipeline_spark import dq, streaming
from realtime_data_pipeline_spark.session import get_spark


def _spin(stop):
    x = 0
    while not stop.is_set():
        x += 1


def main() -> None:
    reps = int(os.environ.get("SPL_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sink-pool-load-probe")
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    rules = [dq.Rule("neg_value", F.col("value") < 0)]
    doc_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    td = tempfile.mkdtemp(prefix="spl_")
    split_dir = os.path.join(td, "events_split")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(8).write.parquet(
        split_dir
    )
    split_files = [
        os.path.join(split_dir, f)
        for f in os.listdir(split_dir)
        if f.endswith(".parquet")
    ]

    def dq_multibatch() -> float:
        with tempfile.TemporaryDirectory() as td2:
            inbox = os.path.join(td2, "inbox")
            os.makedirs(inbox)
            for i, f in enumerate(split_files):
                shutil.copy(f, os.path.join(inbox, f"b{i}.parquet"))
            t0 = time.perf_counter()
            sq = streaming.dq_gated_stream(
                streaming.read_file_stream(
                    spark, inbox, ev_schema, fmt="parquet",
                    max_files_per_trigger=1,
                ),
                rules,
                os.path.join(td2, "silver"),
                os.path.join(td2, "quarantine"),
                checkpoint=os.path.join(td2, "ckpt"),
            )
            assert sq.awaitTermination(300)
            return time.perf_counter() - t0

    def dedup_ingest() -> float:
        with tempfile.TemporaryDirectory() as td2:
            inbox = os.path.join(td2, "inbox")
            os.makedirs(inbox)
            shutil.copy(
                f"{sf_dir}/documents.parquet",
                os.path.join(inbox, "docs.parquet"),
            )
            t0 = time.perf_counter()
            sq = streaming.dedup_ingest_stream(
                streaming.read_file_stream(
                    spark, inbox, doc_schema, fmt="parquet",
                    max_files_per_trigger=1,
                ),
                os.path.join(td2, "fp_index"),
                os.path.join(td2, "silver"),
                checkpoint=os.path.join(td2, "ckpt"),
                content_col="text",
                id_col="doc_id",
            )
            assert sq.awaitTermination(300)
            return time.perf_counter() - t0

    legs = {"dq_multibatch": dq_multibatch, "dedup_ingest": dedup_ingest}
    for fn in legs.values():  # warm
        fn()

    def measure() -> dict:
        out: dict[str, dict[int, list[float]]] = {}
        for _ in range(reps):
            for name, fn in legs.items():
                for workers in (2, 1):
                    streaming.SINK_POOL_WORKERS = workers
                    out.setdefault(name, {}).setdefault(
                        workers, []
                    ).append(round(fn(), 3))
        streaming.SINK_POOL_WORKERS = 2
        return {
            name: {
                str(w): {"min": min(v), "all": v} for w, v in sides.items()
            }
            for name, sides in out.items()
        }

    print(json.dumps({"regime": "idle", **measure()}))

    stop = mp.Event()
    hogs = [mp.Process(target=_spin, args=(stop,)) for _ in range(32)]
    for h in hogs:
        h.start()
    try:
        time.sleep(2)
        print(json.dumps({"regime": "loaded32", **measure()}))
    finally:
        stop.set()
        for h in hogs:
            h.join(timeout=5)
            if h.is_alive():
                h.terminate()
    shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
