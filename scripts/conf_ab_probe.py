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
    # INTERLEAVED rounds (a sequential per-config loop is order-
    # confounded on this shared box: whichever config runs later wins
    # as ambient decays — observed twice before this design). Each
    # round starts a fresh session per config (the shuffle codec is
    # fixed at context start), runs every leg once, and the per-config
    # result is the min across rounds — ambient hits single
    # (config, round) cells, not whole configs.
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, dict[str, float]] = {
        t: {n: float("inf") for n in LEGS} for t in CONFIGS
    }
    from pyspark.sql import SparkSession

    from realtime_data_pipeline_spark.session import get_spark

    for rnd in range(rounds):
        for tag, conf in CONFIGS.items():
            active = SparkSession.getActiveSession()
            if active is not None:
                active.stop()
            spark = get_spark(app_name=f"conf-ab-{tag}", extra_conf=conf)
            from realtime_data_pipeline_spark import queries as q

            # warm scan + codegen
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
            for name in LEGS:
                fn = q.QUERIES.get(name) or q.SHELVED_QUERIES[name]
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()  # per-session warm (codegen for this plan)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                results[tag][name] = min(results[tag][name], dt)
            spark.stop()
            print(f"round {rnd} {tag} done", file=sys.stderr)
    for t in CONFIGS:
        results[t]["__total"] = sum(results[t][n] for n in LEGS)
    names = LEGS + ["__total"]
    print(f"{'leg':35s}" + "".join(f"{t:>14s}" for t in CONFIGS))
    for n in names:
        print(
            f"{n:35s}"
            + "".join(f"{results[t].get(n, -1):14.3f}" for t in CONFIGS)
        )


if __name__ == "__main__":
    main()
