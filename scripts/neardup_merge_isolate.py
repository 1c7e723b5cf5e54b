"""Round-13 verdict item #3: re-measure the neardup_incremental_merge
bench leg in ISOLATION — fresh session, nothing else in the JVM,
flat-token conditions — to attribute the +20% drift in the builder's
own clean r13 run (2.66 -> 3.19 s r12->r13 against a ~4% token shift,
with the leg's code untouched in the r13 diff). Same playbook as the
r12 ivf episode (scripts/ivf_rebuild_isolate.py).

Replicates bench.py's leg byte-for-byte (same warm-up, same prebuilt
corpus index over sf0.1 documents, fresh index copy per pass, same
min-of-N discipline) and prints one JSON line with per-pass times and
both calibration tokens, so the number is directly comparable to
BENCH_STEAL.json entries and BASELINE.md's recorded 2.66 s.
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
    passes = int(os.environ.get("ND_ISOLATE_PASSES", "4"))

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import neardup
    from realtime_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="neardup-merge-isolate")
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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_docs = docs.filter(F.pmod("doc_id", F.lit(20)) == 0)
    corpus_docs = docs.filter(F.pmod("doc_id", F.lit(20)) != 0)

    with tempfile.TemporaryDirectory() as td:
        nd_idx = os.path.join(td, "nd_index")
        neardup.incremental_neardup_minhash(
            corpus_docs, nd_idx, "doc_id", "text"
        )
        n = iter(range(100))

        def merge_once() -> float:  # fresh index copy per pass
            idx_copy = os.path.join(td, f"nd_idx_{next(n)}")
            shutil.copytree(nd_idx, idx_copy)
            t0 = time.perf_counter()
            neardup.incremental_neardup_minhash(
                batch_docs, idx_copy, "doc_id", "text"
            )
            return time.perf_counter() - t0

        warm = merge_once()
        runs, cal, cal_mt, steals = [], [], [], []
        for _ in range(passes):
            s0 = bench._steal_ticks()
            runs.append(round(merge_once(), 3))
            s1 = bench._steal_ticks()
            steals.append(s1 - s0 if s0 >= 0 and s1 >= 0 else -1)
            cal.append(bench._calibration_token())
            cal_mt.append(bench._calibration_token_mt())
            # drop used index copies so the tmpdir doesn't balloon
            for d in os.listdir(td):
                if d != "nd_index":
                    shutil.rmtree(os.path.join(td, d), ignore_errors=True)
        print(
            json.dumps(
                {
                    "leg": "neardup_incremental_merge_isolated",
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
