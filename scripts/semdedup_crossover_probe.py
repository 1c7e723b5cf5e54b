"""Round-16 verdict item #4: MEASURE the semdedup flat/bucket index
layout crossover instead of asserting it.

The r15 probe (BENCH_semdedup_layout_r15.json) proved flat wins at
bench batch sizes — the bucket layout's per-batch dynamic-overwrite
commit walks ~2^n_bits partition dirs (~23 ms/dir) and dominated
index_write — and ARGUED bucket wins back at a large compacted corpus
where its dir-pruned probe reads only the batch's buckets. This probe
locates that crossover on two axes:

* index scale: a compacted index of 1x/10x/30x/100x the sf0.1 corpus
  (2k -> 200k kept vectors), built by the perturbed-copy policy —
  ``copies`` gaussian-perturbed replicas (sigma=0.05) of the base
  embeddings with offset vec_ids, written DIRECTLY in each layout's
  compacted form (``batch_id=-1``; bucket dirs or bucket-clustered
  files) via the same ``_staged_vectors`` bucket math the ingest uses,
  so the probe measures steady-state per-batch cost, not build cost;
* batch width: the bench-shaped 500-row batch covers ~87% of the 256
  buckets (dir pruning nearly moot) vs a 50-row batch covering ~18%
  (dir pruning prunes ~5x) — the crossover is batch-coverage-
  dependent, so the guidance must name both.

Each cell = one ``semdedup_ingest_batch`` against the prebuilt index
(own-partition exclusion makes repeat passes with the same batch_id
comparable), interleaved across layouts per (scale, batch) so both
share box conditions; min over passes; per-stage decomposition from
``LAST_SEMDEDUP_STAGES``. Prints one JSON line; the builder commits it
as BENCH_semdedup_layout_r16.json and records the crossover rule in
the ``semdedup_ingest_batch`` docstring + BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)

import bench  # noqa: E402  (calibration tokens comparable to sidecars)

SCALES = [1, 10, 30, 100]
BATCH_ROWS = [500, 50]
N_BITS = 8
THRESHOLD = 0.35


def main() -> None:
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import similarity as _sim
    from realtime_data_pipeline_spark import streaming
    from realtime_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SEM_XOVER_PASSES", "3"))
    spark = get_spark(app_name="semdedup-crossover-probe")

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base_pd = base.toPandas()
    n0 = len(base_pd)
    dim = len(base_pd["embedding"].iloc[0])
    rng = np.random.RandomState(1234)

    def perturbed(copies: int) -> pd.DataFrame:
        mats = []
        basemat = np.stack(base_pd["embedding"].to_numpy())
        for c in range(copies):
            noisy = basemat + 0.05 * rng.randn(n0, dim)
            mats.append(
                pd.DataFrame(
                    {
                        "vec_id": base_pd["vec_id"].to_numpy()
                        + (c + 1) * 10_000_000,
                        "embedding": list(noisy),
                    }
                )
            )
        return pd.concat(mats, ignore_index=True)

    def build_index(path: str, layout: str, copies: int) -> int:
        corpus = spark.createDataFrame(perturbed(copies))
        staged = _sim._staged_vectors(corpus, "embedding", N_BITS, None)
        idx = staged.select(
            F.col("vec_id"),
            F.col("__vec").alias("vec"),
            F.col("__norm").alias("norm"),
            F.col("__bucket").alias("bucket"),
            F.lit(-1).alias("batch_id"),
        )
        if layout == "bucket":
            (
                idx.repartition("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket", "batch_id")
                .parquet(path)
            )
        else:
            (
                idx.repartition(4, F.col("bucket"))
                .sortWithinPartitions("bucket")
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(path)
            )
        return copies * n0

    # fixed probe batches sliced from the BASE corpus (not perturbed):
    # deterministic, same rows for every cell
    batches = {
        nb: base.orderBy("vec_id").limit(nb).cache() for nb in BATCH_ROWS
    }
    cover = {}
    for nb, bdf in batches.items():
        bdf.count()
        cover[nb] = (
            _sim._staged_vectors(bdf, "embedding", N_BITS, None)
            .select("__bucket")
            .distinct()
            .count()
        )

    out: dict[str, dict] = {}
    cal, cal_mt, steals = [], [], []
    with tempfile.TemporaryDirectory() as td:
        for scale in SCALES:
            paths = {}
            for layout in ("bucket", "flat"):
                p = os.path.join(td, f"idx_{layout}_{scale}")
                build_index(p, layout, scale)
                paths[layout] = p
            for nb in BATCH_ROWS:
                for layout in ("bucket", "flat"):
                    name = f"{layout}_x{scale}_b{nb}"
                    cell = {"all_sec": [], "stages_per_pass": []}
                    for _ in range(passes):
                        s0 = bench._steal_ticks()
                        streaming.LAST_SEMDEDUP_STAGES.clear()
                        silver = os.path.join(
                            td, f"silver_{name}"
                        )
                        t0 = time.perf_counter()
                        streaming.semdedup_ingest_batch(
                            batches[nb],
                            7,
                            paths[layout],
                            silver,
                            id_col="vec_id",
                            vec_col="embedding",
                            threshold=THRESHOLD,
                            n_bits=N_BITS,
                            index_layout=layout,
                        )
                        dt = time.perf_counter() - t0
                        s1 = bench._steal_ticks()
                        steals.append(
                            s1 - s0 if s0 >= 0 and s1 >= 0 else -1
                        )
                        cell["all_sec"].append(round(dt, 3))
                        cell["stages_per_pass"].append(
                            {
                                k: round(v, 3)
                                for k, v in dict(
                                    streaming.LAST_SEMDEDUP_STAGES
                                ).items()
                            }
                        )
                    cell["best_sec"] = min(cell["all_sec"])
                    out[name] = cell
            cal.append(bench._calibration_token())
            cal_mt.append(bench._calibration_token_mt())

    # crossover summary: per (scale, batch), bucket vs flat best
    xover = {}
    for scale in SCALES:
        for nb in BATCH_ROWS:
            b = out[f"bucket_x{scale}_b{nb}"]["best_sec"]
            f_ = out[f"flat_x{scale}_b{nb}"]["best_sec"]
            xover[f"x{scale}_b{nb}"] = {
                "bucket_sec": b,
                "flat_sec": f_,
                "bucket_wins": b < f_,
                "ratio_flat_over_bucket": round(f_ / b, 2) if b else None,
            }
    print(
        json.dumps(
            {
                "probe": "semdedup_layout_crossover_r16",
                "sf_dir": sf_dir,
                "base_rows": n0,
                "n_bits": N_BITS,
                "threshold": THRESHOLD,
                "perturb_sigma": 0.05,
                "batch_bucket_coverage": {
                    str(nb): f"{cover[nb]}/{2 ** N_BITS}"
                    for nb in BATCH_ROWS
                },
                "cells": out,
                "crossover": xover,
                "calibration_sec": cal,
                "calibration_mt_sec": cal_mt,
                "steal_ticks": steals,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
