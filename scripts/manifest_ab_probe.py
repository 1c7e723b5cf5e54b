"""Round-17 A/B probe: hive-vs-manifest layout on the bench-shaped
write paths (scd2 merge, IVF rebuild/append/search, incremental
semantic dedup).

Design (shared-VM honesty, per round-16's order-confounding lesson):
both layouts run INTERLEAVED in one session — rep i runs every
(target, layout) cell before rep i+1 — so ambient drift hits both
sides equally; report min and median per cell. The layouts are
parameters of the same HEAD code (layout="hive" is the pre-r17
spelling, byte-identical write shape), so no stash juggling.

Usage: MAB_REPS=3 python scripts/manifest_ab_probe.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from realtime_data_pipeline_spark import medallion, similarity
from realtime_data_pipeline_spark.session import get_spark


def main() -> None:
    reps = int(os.environ.get("MAB_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="manifest-ab-probe")
    sc = spark.sparkContext
    td = tempfile.mkdtemp(prefix="mab_")
    out: dict[str, dict[str, list[float]]] = {}

    def rec(target: str, layout: str, sec: float) -> None:
        out.setdefault(target, {}).setdefault(layout, []).append(sec)

    # ---- scd2 merge (bench leg shape: full-events dim, ~100-user batch)
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
    ).localCheckpoint(eager=True)
    dims = {}
    for layout in ("hive", "manifest"):
        dims[layout] = os.path.join(td, f"scd2_dim_{layout}")
        medallion.scd2_merge(
            spark, dims[layout], ev_obs, keys=["user_id"],
            effective_col="ts", layout=layout,
        )
    _n = iter(range(10_000))

    def scd2_once(layout: str) -> float:
        copy = os.path.join(td, f"scd2_copy_{next(_n)}")
        shutil.copytree(dims[layout], copy)
        t0 = time.perf_counter()
        medallion.scd2_merge(
            spark, copy, scd2_batch, keys=["user_id"], effective_col="ts",
        )
        return time.perf_counter() - t0

    # ---- IVF rebuild / append / search (bench leg shapes)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch_emb = emb.filter(F.pmod("vec_id", F.lit(20)) == 0)
    corpus_emb = emb.filter(F.pmod("vec_id", F.lit(20)) != 0)
    cents_full = similarity.train_centroids_kmeans(emb, 64)
    cents_corpus = similarity.train_centroids_kmeans(corpus_emb, 64)
    ivf_queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    base_idx = {}
    search_idx = {}
    for layout in ("hive", "manifest"):
        base_idx[layout] = os.path.join(td, f"ivf_base_{layout}")
        similarity.build_ivf_index(
            corpus_emb, base_idx[layout], cents_corpus, layout=layout
        )
        search_idx[layout] = os.path.join(td, f"ivf_search_{layout}")
        similarity.build_ivf_index(
            emb, search_idx[layout], cents_full, layout=layout
        )

    def ivf_rebuild_once(layout: str) -> float:
        # quantizer training included, like the bench leg
        t0 = time.perf_counter()
        cents = similarity.train_centroids_kmeans(emb, 64)
        similarity.build_ivf_index(
            emb, os.path.join(td, f"ivf_rb_{next(_n)}"), cents,
            layout=layout,
        )
        return time.perf_counter() - t0

    def ivf_append_once(layout: str) -> float:
        copy = os.path.join(td, f"ivf_app_{next(_n)}")
        shutil.copytree(base_idx[layout], copy)
        t0 = time.perf_counter()
        similarity.append_to_ivf_index(batch_emb, copy)
        return time.perf_counter() - t0

    def ivf_search_once(layout: str) -> float:
        t0 = time.perf_counter()
        (
            similarity.ivf_index_search(
                spark, search_idx[layout], ivf_queries, k=10, nprobe=4
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    # ---- incremental semantic dedup (bench leg shape)
    emb_slim = emb.select("vec_id", "embedding")
    first = emb_slim.filter(F.pmod("vec_id", F.lit(3)) == 0)
    second = emb_slim.filter(F.pmod("vec_id", F.lit(3)) == 1)
    sem_base = {}
    for layout in ("hive", "manifest"):
        sem_base[layout] = os.path.join(td, f"sem_{layout}")
        if layout == "hive":
            # pre-r17 spelling: seed a bucket-dir index so the append
            # path stays hive for life
            staged = similarity._staged_vectors(first, "embedding", 8, None)
            (
                staged.select(
                    F.col("vec_id"),
                    F.col("__vec").alias("vec"),
                    F.col("__norm").alias("norm"),
                    F.col("__bucket").alias("bucket"),
                )
                .repartition("bucket")
                .write.mode("append")
                .partitionBy("bucket")
                .parquet(sem_base[layout])
            )
        else:
            similarity.incremental_semantic_dedup(
                first, sem_base[layout], threshold=0.35
            )

    def sem_once(layout: str) -> float:
        copy = os.path.join(td, f"sem_c_{next(_n)}")
        shutil.copytree(sem_base[layout], copy)
        t0 = time.perf_counter()
        similarity.incremental_semantic_dedup(second, copy, threshold=0.35)
        return time.perf_counter() - t0

    cells = {
        "scd2_merge": scd2_once,
        "ivf_rebuild": ivf_rebuild_once,
        "ivf_append": ivf_append_once,
        "ivf_search": ivf_search_once,
        "sem_incremental": sem_once,
    }
    # warm both layouts once (codegen/JIT), unrecorded
    for fn in cells.values():
        for layout in ("hive", "manifest"):
            fn(layout)
    for rep in range(reps):
        for name, fn in cells.items():
            for layout in ("hive", "manifest"):
                sc.setJobDescription(f"mab:{name}:{layout}:rep{rep}")
                rec(name, layout, fn(layout))

    shutil.rmtree(td, ignore_errors=True)
    summary = {}
    for name, sides in out.items():
        s = {}
        for layout, xs in sides.items():
            xs = sorted(xs)
            s[layout] = {
                "min": round(xs[0], 3),
                "med": round(xs[len(xs) // 2], 3),
                "all": [round(x, 3) for x in xs],
            }
        s["speedup_min"] = round(
            s["hive"]["min"] / max(s["manifest"]["min"], 1e-9), 2
        )
        summary[name] = s
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
