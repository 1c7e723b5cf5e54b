"""Round-15 verdict item #2: MEASURE the semdedup index_write
alternatives the r14 stage decomposition motivated. That decomposition
(BENCH_STEAL r14, preserved in git history / BASELINE.md) named
index_write ~80% of the streaming_semdedup_multibatch leg and
attributed it to the bucket layout's dynamic-overwrite commit walking
~2^n_bits partition directories per batch (~23 ms/dir, constant in
batch size). The levers on record: a flat batch_id-only layout
(one commit dir per batch, bucket becomes a clustered plain column —
``index_layout="flat"``), or fewer bucket dirs (lower ``n_bits``).

This probe replicates bench.py's multibatch leg (N embedding files ->
N micro-batches through ONE started query at sf0.1) under each config,
INTERLEAVED round-robin so all configs share box conditions, with the
per-stage decomposition captured per run. Configs:

- bucket8_b4: the bench leg's current default (256 bucket dirs, 4 batches)
- flat8_b4:   flat layout, same bucketing math (4 batches)
- bucket6_b4: 64 bucket dirs (n_bits-2), 4 batches
- bucket8_b8 / flat8_b8: the batch-count axis — the bucket commit floor
  is per-batch, so doubling batches should ~double its share under
  "bucket" and stay near-flat under "flat"

Prints one JSON line; the builder commits it as
BENCH_semdedup_layout_r15.json and records the reading in BASELINE.md.
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

import bench  # noqa: E402  (calibration tokens comparable to sidecars)

CONFIGS = [
    ("bucket8_b4", "bucket", 8, 4),
    ("flat8_b4", "flat", 8, 4),
    ("bucket6_b4", "bucket", 6, 4),
    ("bucket8_b8", "bucket", 8, 8),
    ("flat8_b8", "flat", 8, 8),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SEM_LAYOUT_PASSES", "2"))

    from realtime_data_pipeline_spark import streaming
    from realtime_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="semdedup-layout-probe")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_schema = emb.schema
    emb.count()  # scan warm-up

    with tempfile.TemporaryDirectory() as td:
        splits: dict[int, list[str]] = {}
        for nb in sorted({c[3] for c in CONFIGS}):
            d = os.path.join(td, f"split_{nb}")
            emb.repartition(nb).write.parquet(d)
            splits[nb] = [
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            ]

        def run_once(layout: str, n_bits: int, n_batches: int) -> tuple:
            with tempfile.TemporaryDirectory() as td2:
                inbox = os.path.join(td2, "inbox")
                os.makedirs(inbox)
                for i, f in enumerate(splits[n_batches]):
                    dst = os.path.join(inbox, f"b{i}.parquet")
                    shutil.copy(f, dst)
                    # pin strict file-source ordering: mtime ties would
                    # let the micro-batch ORDER (and so the greedy-kept
                    # chain and the silver count) drift between passes
                    t = 1_700_000_000 + i * 10
                    os.utime(dst, (t, t))
                streaming.LAST_SEMDEDUP_STAGES.clear()
                t0 = time.perf_counter()
                sq = streaming.semdedup_ingest_stream(
                    streaming.read_file_stream(
                        spark, inbox, emb_schema, fmt="parquet",
                        max_files_per_trigger=1,
                    ),
                    os.path.join(td2, "sem_index"),
                    os.path.join(td2, "silver"),
                    checkpoint=os.path.join(td2, "ckpt"),
                    id_col="vec_id",
                    vec_col="embedding",
                    threshold=0.35,
                    n_bits=n_bits,
                    index_layout=layout,
                )
                if not sq.awaitTermination(600):
                    sq.stop()
                    raise RuntimeError("layout probe run did not finish")
                dt = time.perf_counter() - t0
                stages = dict(streaming.LAST_SEMDEDUP_STAGES)
                n_silver = spark.read.parquet(
                    os.path.join(td2, "silver")
                ).count()
                return dt, stages, n_silver

        # warm each config once (query-start + codegen machinery)
        warm = {
            name: round(run_once(layout, nb, nbat)[0], 3)
            for name, layout, nb, nbat in CONFIGS
        }
        out: dict[str, dict] = {
            name: {"all_sec": [], "stages_per_pass": [], "n_silver": None}
            for name, *_ in CONFIGS
        }
        cal, cal_mt, steals = [], [], []
        for _ in range(passes):
            for name, layout, nb, nbat in CONFIGS:
                s0 = bench._steal_ticks()
                dt, stages, n_silver = run_once(layout, nb, nbat)
                s1 = bench._steal_ticks()
                steals.append(s1 - s0 if s0 >= 0 and s1 >= 0 else -1)
                out[name]["all_sec"].append(round(dt, 3))
                out[name]["stages_per_pass"].append(
                    {k: round(v, 3) for k, v in stages.items()}
                )
                if out[name]["n_silver"] is None:
                    out[name]["n_silver"] = n_silver
                else:
                    # layouts must not change the dedup answer
                    assert out[name]["n_silver"] == n_silver, name
            cal.append(bench._calibration_token())
            cal_mt.append(bench._calibration_token_mt())
        for name in out:
            out[name]["best_sec"] = min(out[name]["all_sec"])
        # cross-layout correctness: every config keeps the same rows
        kept = {v["n_silver"] for v in out.values()
                if v["n_silver"] is not None}
        print(
            json.dumps(
                {
                    "probe": "semdedup_index_layout_r15",
                    "sf_dir": sf_dir,
                    "configs": out,
                    "warm_sec": warm,
                    "silver_counts_agree": len(kept) <= 2,  # n_bits=6
                    # widens buckets -> may drop a few more near-dups;
                    # flat vs bucket at the SAME n_bits must agree
                    "flat_eq_bucket_n8": (
                        out["flat8_b4"]["n_silver"]
                        == out["bucket8_b4"]["n_silver"]
                    ),
                    "calibration_sec": cal,
                    "calibration_mt_sec": cal_mt,
                    "steal_ticks": steals,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
