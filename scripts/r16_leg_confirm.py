"""Round-17 confirmation isolate (VERDICT r16 item #3): time the five
r16-touched legs — pagerank, neardup_incremental_merge,
scd2_merge_batch, streaming_dedup_ingest, streaming_dq_gate_multibatch
— against an arbitrary checkout of the engine (repo root = argv[1]),
bench-shaped at sf0.1, ONE timed pass per leg per invocation.

Run it alternately against the r15-code and r16-code worktrees
(A,B,A,B,...) so both sides share the ambient window; aggregate
min-per-side across invocations. Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

root = os.path.abspath(sys.argv[1])
sys.path.insert(0, root)
os.environ["PYTHONPATH"] = root + os.pathsep + os.environ.get(
    "PYTHONPATH", ""
)

from pyspark.sql import functions as F  # noqa: E402

from realtime_data_pipeline_spark import (  # noqa: E402
    dedup,
    dq,
    graph,
    medallion,
    neardup,
    streaming,
)
from realtime_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16-leg-confirm")
    sc = spark.sparkContext
    out: dict[str, float] = {}
    td = tempfile.mkdtemp(prefix="r16c_")

    # warm the JVM like bench does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # pagerank
    def pagerank_leg() -> float:
        edges = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
        )
        t0 = time.perf_counter()
        ranks = graph.pagerank(edges, iterations=5, checkpoint_every=3)
        ranks.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    sc.setJobDescription("confirm: pagerank")
    pagerank_leg()  # warm
    out["pagerank"] = pagerank_leg()

    # neardup incremental merge
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_docs = docs.filter(F.pmod("doc_id", F.lit(20)) == 0)
    corpus_docs = docs.filter(F.pmod("doc_id", F.lit(20)) != 0)
    nd_idx = os.path.join(td, "nd_index")
    sc.setJobDescription("confirm: neardup merge")
    neardup.incremental_neardup_minhash(corpus_docs, nd_idx, "doc_id", "text")
    _n = iter(range(100))

    def nd_merge_once() -> float:
        idx_copy = os.path.join(td, f"nd_{next(_n)}")
        shutil.copytree(nd_idx, idx_copy)
        t0 = time.perf_counter()
        neardup.incremental_neardup_minhash(
            batch_docs, idx_copy, "doc_id", "text"
        )
        return time.perf_counter() - t0

    nd_merge_once()  # warm
    out["neardup_incremental_merge"] = nd_merge_once()

    # scd2 merge (hive layout on BOTH sides: this confirms the r16
    # Observation change, not the r17 manifest layout)
    ev_obs = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "value", "ts"
    )
    scd2_batch = (
        ev_obs.filter(F.pmod("user_id", F.lit(15)) == 0)
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("ts"),
            F.first("event_type").alias("event_type"),
            F.round(F.sum("value"), 2).alias("value"),
        )
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 365 DAYS"))
    )
    dim0 = os.path.join(td, "scd2_dim")
    sc.setJobDescription("confirm: scd2 merge")
    try:
        medallion.scd2_merge(
            spark, dim0, ev_obs, keys=["user_id"], effective_col="ts",
            layout="hive",
        )
    except TypeError:  # pre-r17 signature has no layout param
        medallion.scd2_merge(
            spark, dim0, ev_obs, keys=["user_id"], effective_col="ts",
        )

    def scd2_once() -> float:
        copy = os.path.join(td, f"scd2_{next(_n)}")
        shutil.copytree(dim0, copy)
        t0 = time.perf_counter()
        medallion.scd2_merge(
            spark, copy, scd2_batch, keys=["user_id"], effective_col="ts",
        )
        return time.perf_counter() - t0

    scd2_once()  # warm
    out["scd2_merge_batch"] = scd2_once()

    # streaming dedup ingest
    doc_schema2 = docs.schema

    def dedup_ingest_once() -> float:
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
                    spark, inbox, doc_schema2, fmt="parquet",
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

    sc.setJobDescription("confirm: streaming dedup ingest")
    dedup_ingest_once()  # warm
    out["streaming_dedup_ingest"] = dedup_ingest_once()

    # streaming dq multibatch (8 triggers)
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    rules = [dq.Rule("neg_value", F.col("value") < 0)]
    split_dir = os.path.join(td, "events_split")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(8).write.parquet(
        split_dir
    )
    split_files = [
        os.path.join(split_dir, f)
        for f in os.listdir(split_dir)
        if f.endswith(".parquet")
    ]

    def dq_multibatch_once() -> float:
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

    sc.setJobDescription("confirm: dq multibatch")
    dq_multibatch_once()  # warm
    out["streaming_dq_gate_multibatch"] = dq_multibatch_once()

    shutil.rmtree(td, ignore_errors=True)
    print(
        json.dumps(
            {"root": root, **{k: round(v, 3) for k, v in out.items()}}
        )
    )


if __name__ == "__main__":
    main()
