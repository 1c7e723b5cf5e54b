"""Bench harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
exactly ONE JSON line:

    {"metric": "headline_queries_wall", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

The driver runs this per-round and records BENCH_r{N}.json. Keep the
query list to the scale-meaningful ones (scans, joins, window dedup) —
not every declared oracle query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # scans + aggregation
    "pricing_summary_q1",
    "dq_pricing_summary",
    "lineitem_rollup_matrix",
    "forecast_revenue_q6",
    # joins (broadcast-dim chain over the fact table)
    "revenue_per_nation",
    "shipping_priority_q3",
    # windows / dedup
    "events_keep_latest_per_user",
    "events_tumbling_5min",
    # LLM-data operators
    "doc_quality_profile",
    "embedding_knn_bruteforce",
    "docs_neardup_minhash",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from realtime_data_pipeline_spark import queries as q
    from realtime_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="rdp-bench")
    # warm the JVM once — scan, codegen, broadcast, and agg machinery — so
    # per-query numbers measure the query, not first-use class loading
    from pyspark.sql import functions as F

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .count()
        .count()
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # spawn + warm the Arrow Python workers (numpy/pandas import cost) so
    # UDF-bearing queries measure compute, not interpreter startup
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(0, 64, 1, 64).select(_warm("id")).count()

    names = [n for n in HEADLINE if n in q.QUERIES]
    timings: dict[str, float] = {}
    for name in names:
        fn = q.QUERIES[name]
        # noop sink: forces FULL computation of every output column —
        # count() would let Catalyst prune projected expressions and
        # under-measure per-row transform queries. The warm pass compiles
        # the query's codegen; the timed pass RE-CONSTRUCTS the query so
        # eagerly-materializing operators (the MinHash signature
        # checkpoint) are inside the measurement, then executes to the
        # sink — steady state with no cached results carried over.
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # best-of-2 timed passes: this box is a shared VM with visible CPU
        # steal (/proc/stat col 8); a single pass can land in a steal spike
        # and report 10× the true cost. Min-of-N measures the query, not
        # the neighbor.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    # Skewed-join leg: 80% of lineitem lands on ONE join key (the straggler
    # shape AQE skew-split fixes at real partition sizes; at sf0.1 the skewed
    # partition is far below AQE's split threshold, so this leg measures the
    # MANUAL mitigation — ops.salted_join spreading the hot key over 32
    # sub-keys). Broadcast is disabled to force the sort-merge path a 100 TB
    # dim-join would take; tests/test_plans.py asserts the salted exchange
    # partitions on (k, __salt) so no single task owns the hot key.
    from realtime_data_pipeline_spark import ops

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    skewed_left = li.select(
        F.when(F.pmod("l_orderkey", F.lit(10)) < 8, F.lit(0))
        .otherwise(F.pmod("l_orderkey", F.lit(1000)))
        .cast("long")
        .alias("k"),
        "l_extendedprice",
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 0.01).alias("weight")
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def skew_leg():
            return (
                ops.salted_join(skewed_left, dim, "k", salt_buckets=32)
                .groupBy("k")
                .agg(F.sum(F.col("l_extendedprice") * F.col("weight")).alias("wrev"))
            )

        skew_leg().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            skew_leg().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings["skewed_join_salted"] = round(best, 3)
        print(
            f"# skewed_join_salted: {timings['skewed_join_salted']}s",
            file=sys.stderr,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)

    # Structured Streaming leg: availableNow DQ-gated run of the events
    # table through the file source -> foreachBatch gate -> partitioned
    # parquet sinks. This is the named approach of the engine; wall time
    # covers source listing, the per-batch rule scan, and both sink writes.
    import shutil
    import tempfile

    from realtime_data_pipeline_spark import dq, streaming

    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    rules = [dq.Rule("neg_value", F.col("value") < 0)]

    def stream_leg_once() -> float:
        # fresh inbox/checkpoint/sinks per pass: a streaming run is only
        # re-runnable from scratch, and reusing a checkpoint would no-op
        with tempfile.TemporaryDirectory() as td:
            inbox = os.path.join(td, "inbox")
            os.makedirs(inbox)
            shutil.copy(
                f"{sf_dir}/events.parquet",
                os.path.join(inbox, "events.parquet"),
            )
            t0 = time.perf_counter()
            sq = streaming.dq_gated_stream(
                streaming.read_file_stream(
                    spark, inbox, ev_schema, fmt="parquet",
                    max_files_per_trigger=1,
                ),
                rules,
                os.path.join(td, "silver"),
                os.path.join(td, "quarantine"),
                checkpoint=os.path.join(td, "ckpt"),
            )
            if not sq.awaitTermination(300):
                sq.stop()
                raise RuntimeError(
                    "streaming DQ gate leg did not finish in 300s"
                )
            return time.perf_counter() - t0

    # best-of-2 like every other leg (round-3 verdict: this was the one
    # single-pass-timed leg on a steal-prone shared VM, so its deltas were
    # unattributable noise); the first pass also warms the streaming
    # machinery (source listing, foreachBatch codegen)
    timings["streaming_dq_gate"] = round(
        min(stream_leg_once() for _ in range(2)), 3
    )
    print(f"# streaming_dq_gate: {timings['streaming_dq_gate']}s", file=sys.stderr)

    # Curated-gate variant: the same gate with the curation stage (PII
    # redaction + quality band gate, pure column exprs) on the clean side,
    # over the documents corpus — measures the marginal cost of in-stream
    # curation relative to plain routing.
    doc_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    doc_rules = [dq.Rule("empty_doc", F.col("n_chars") <= 0)]

    def curated_leg_once() -> float:
        with tempfile.TemporaryDirectory() as td:
            inbox = os.path.join(td, "inbox")
            os.makedirs(inbox)
            shutil.copy(
                f"{sf_dir}/documents.parquet",
                os.path.join(inbox, "documents.parquet"),
            )
            t0 = time.perf_counter()
            sq = streaming.dq_gated_stream(
                streaming.read_file_stream(
                    spark, inbox, doc_schema, fmt="parquet",
                    max_files_per_trigger=1,
                ),
                doc_rules,
                os.path.join(td, "silver"),
                os.path.join(td, "quarantine"),
                checkpoint=os.path.join(td, "ckpt"),
                curate=streaming.curation_stage(
                    text_col="text", min_bands=("medium", "high")
                ),
            )
            if not sq.awaitTermination(300):
                sq.stop()
                raise RuntimeError(
                    "curated streaming gate leg did not finish in 300s"
                )
            return time.perf_counter() - t0

    timings["streaming_curated_gate"] = round(
        min(curated_leg_once() for _ in range(2)), 3
    )
    print(
        f"# streaming_curated_gate: {timings['streaming_curated_gate']}s",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
