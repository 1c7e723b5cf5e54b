"""Config A/B probe (optimization guide §1.2 step 3 / §9): time a
representative leg subset under candidate session configs, min-of-N,
fresh session per config (configs like the shuffle codec are fixed at
context start). Prints a per-config table; pick winners by measured
delta, not by faith.

    python scripts/conf_ab_probe.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# legs: JVM-agg scan, fact-fact join chain, banded range join, blocked
# fuzzy self-join, LSH near-dup, bucketed cosine self-join
LEGS = [
    "pricing_summary_q1",
    "revenue_per_nation",
    "shipments_in_order_windows",
    "suppliers_fuzzy_name_pairs",
    "docs_neardup_minhash",
    "embeddings_semantic_dedup",
]

CONFIGS = {
    "baseline": {},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "zstd_shuffle": {"spark.io.compression.codec": "zstd"},
    "shj+zstd": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.io.compression.codec": "zstd",
    },
}


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, dict[str, float]] = {}
    for tag, conf in CONFIGS.items():
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        from realtime_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name=f"conf-ab-{tag}", extra_conf=conf)
        from realtime_data_pipeline_spark import queries as q

        # warm scan + codegen
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
        res: dict[str, float] = {}
        for name in LEGS:
            fn = q.QUERIES.get(name) or q.SHELVED_QUERIES[name]
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            res[name] = round(best, 3)
        res["__total"] = round(sum(res.values()), 3)
        results[tag] = res
        print(f"{tag}: {res}", file=sys.stderr)
        spark.stop()
    names = LEGS + ["__total"]
    print(f"{'leg':35s}" + "".join(f"{t:>14s}" for t in CONFIGS))
    for n in names:
        print(
            f"{n:35s}"
            + "".join(f"{results[t].get(n, -1):14.3f}" for t in CONFIGS)
        )


if __name__ == "__main__":
    main()
