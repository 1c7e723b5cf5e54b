"""Round-17 core-scaling run at 10x data (VERDICT r16 #7): at sf0.1 the
c8/c32 comparison reads ~1.0 everywhere because every leg sits on the
per-job scheduling floor; at 10x the data cost is visible and parallel
legs should separate toward the core ratio.

Two modes:
  build : materialize the 10x perturbed dataset into $CS10_DIR (reuses
          bench._build_ramp) — run once.
  run   : time a compute-real leg subset against $CS10_DIR under the
          CURRENT $SPARK_GRAFT_CPUS, print one JSON line. Run it once
          with 32 and once with 8; the driver-side ratio table goes in
          OPTIMIZATION_r17.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEGS = [
    "pricing_summary_q1",
    "forecast_revenue_q6",
    "revenue_per_nation",
    "doc_quality_profile",
    "embedding_knn_bruteforce",
    "docs_pack_chunks",
    "local_supplier_volume_q5",
    "parts_copurchase_pairs",
    "events_dau_wau",
    "embeddings_pca_scores",
]


def main() -> None:
    mode = sys.argv[1]
    out_dir = os.environ.get("CS10_DIR", "/tmp/cs10_data")
    import bench  # noqa: E402 - repo root on path

    from realtime_data_pipeline_spark import queries as q
    from realtime_data_pipeline_spark.session import get_spark

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"core-scaling-10x-{mode}")
    if mode == "build":
        t0 = time.perf_counter()
        bench._build_ramp(spark, base_dir, out_dir, 10)
        print(json.dumps({"built": out_dir, "sec": round(time.perf_counter() - t0, 3)}))
        return
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # JVM warm like bench
    spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(0, 64, 1, 64).select(_warm("id")).count()
    out = {}
    for name in LEGS:
        fn = bench._query_fn(q, name)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, out_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = min(times)
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"cpus": int(cpus), "data": out_dir, "legs": out}))


if __name__ == "__main__":
    main()
