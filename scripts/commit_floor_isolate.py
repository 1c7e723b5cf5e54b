"""Isolate the per-directory write-commit floor (round 17, guide §1/§6).

Times, for the same ~200k-row frame hashed into N buckets:
  a) dynamic-partition-overwrite into an existing N-dir hive table
     (the scd2_merge / semdedup-bucket write shape),
  b) static overwrite partitionBy into a fresh dir (the IVF rebuild shape),
  c) flat single-dir write of identical bytes (the manifest-layout shape),
  d) flat write + atomic manifest swap (tmp json + os.replace).

Run AFTER any concurrent Spark work has drained; min-of-3 per shape.
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

from realtime_data_pipeline_spark.session import get_spark


def main() -> None:
    n_dirs = int(os.environ.get("CF_DIRS", "90"))
    rows = int(os.environ.get("CF_ROWS", "200000"))
    passes = int(os.environ.get("CF_PASSES", "3"))
    spark = get_spark(app_name="commit-floor-isolate")
    sc = spark.sparkContext
    df = (
        spark.range(rows)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64("id"), F.lit(n_dirs)).cast("int").alias("b"),
            (F.col("id") % 997 * 1.7).alias("v"),
        )
    )
    df = df.localCheckpoint(eager=True)  # time the write, not the gen
    base = tempfile.mkdtemp(prefix="cf_")
    out: dict[str, list[float]] = {k: [] for k in ("dyn", "static", "flat", "flat_manifest")}

    # seed an existing table for the dynamic-overwrite shape
    seed = os.path.join(base, "seed")
    df.write.mode("overwrite").partitionBy("b").parquet(seed)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for _ in range(passes):
            sc.setJobDescription("cf: dynamic overwrite")
            t0 = time.perf_counter()
            df.write.mode("overwrite").partitionBy("b").parquet(seed)
            out["dyn"].append(time.perf_counter() - t0)

            tgt = os.path.join(base, "static")
            shutil.rmtree(tgt, ignore_errors=True)
            sc.setJobDescription("cf: static partitioned")
            t0 = time.perf_counter()
            df.write.mode("overwrite").partitionBy("b").parquet(tgt)
            out["static"].append(time.perf_counter() - t0)

            tgt = os.path.join(base, "flat")
            shutil.rmtree(tgt, ignore_errors=True)
            sc.setJobDescription("cf: flat single dir")
            t0 = time.perf_counter()
            df.repartition(n_dirs, "b").sortWithinPartitions("b").write.mode(
                "overwrite"
            ).parquet(tgt)
            out["flat"].append(time.perf_counter() - t0)

            tgt = os.path.join(base, "flatm")
            shutil.rmtree(tgt, ignore_errors=True)
            sc.setJobDescription("cf: flat + manifest swap")
            t0 = time.perf_counter()
            df.repartition(n_dirs, "b").sortWithinPartitions("b").write.mode(
                "overwrite"
            ).parquet(os.path.join(tgt, "gen=0"))
            man = {"buckets": {str(i): ["gen=0"] for i in range(n_dirs)}}
            tmp = os.path.join(tgt, ".manifest.tmp")
            with open(tmp, "w") as f:
                json.dump(man, f)
            os.replace(tmp, os.path.join(tgt, "manifest.json"))
            out["flat_manifest"].append(time.perf_counter() - t0)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(base, ignore_errors=True)

    summary = {
        "n_dirs": n_dirs,
        "rows": rows,
        **{k: round(min(v), 3) for k, v in out.items()},
        "all": {k: [round(x, 3) for x in v] for k, v in out.items()},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
