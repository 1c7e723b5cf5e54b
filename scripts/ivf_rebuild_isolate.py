"""Round-12 verdict item #1: re-measure the ivf_index_rebuild bench leg
in ISOLATION — fresh session, nothing else in the JVM, flat-token
conditions — to attribute the r11 1.96x regression (9.29s vs r10's
4.73s with single tokens flat and the mt token explaining only ~+50%).

Replicates bench.py's leg byte-for-byte (same warm-up, same kmeans
train + full build over sf0.1 embeddings, same min-of-N discipline) and
prints one JSON line with per-pass times and both calibration tokens,
so the number is directly comparable to BENCH_STEAL.json entries.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)

import bench  # noqa: E402  (reuses the tokens so values are comparable)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("IVF_ISOLATE_PASSES", "4"))

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import similarity
    from realtime_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ivf-rebuild-isolate")
    # identical warm-up to bench.main(): JVM scan/codegen/broadcast/agg
    # machinery + the Arrow Python workers
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .groupBy("r_name")
        .count()
        .count()
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(0, 64, 1, 64).select(_warm("id")).count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with tempfile.TemporaryDirectory() as td:
        n = iter(range(100))

        def rebuild_once() -> float:
            t0 = time.perf_counter()
            cents = similarity.train_centroids_kmeans(emb, 64)
            similarity.build_ivf_index(
                emb, os.path.join(td, f"full_{next(n)}"), cents
            )
            return time.perf_counter() - t0

        warm = rebuild_once()
        runs, cal, cal_mt, steals = [], [], [], []
        for _ in range(passes):
            s0 = bench._steal_ticks()
            runs.append(round(rebuild_once(), 3))
            s1 = bench._steal_ticks()
            steals.append(s1 - s0 if s0 >= 0 and s1 >= 0 else -1)
            cal.append(bench._calibration_token())
            cal_mt.append(bench._calibration_token_mt())
            # drop finished index dirs so the tmpdir doesn't balloon
            for d in os.listdir(td):
                shutil.rmtree(os.path.join(td, d), ignore_errors=True)
        print(
            json.dumps(
                {
                    "leg": "ivf_index_rebuild_isolated",
                    "sf_dir": sf_dir,
                    "warm_sec": round(warm, 3),
                    "all_sec": runs,
                    "best_sec": min(runs),
                    "calibration_sec": cal,
                    "calibration_mt_sec": cal_mt,
                    "steal_ticks": steals,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
