"""Measure Z-order multi-column file skipping → ZORDER_PRUNE.json.

The CI gate (tests/test_bucketing.py) asserts the QUALITATIVE claim —
z-ordered files cover narrow ranges on BOTH clustered columns. This
script puts NUMBERS on it at sf0.1: lineitem written three ways
(hash-shuffled baseline, single-column range sort, Z-order on two
columns), then for a selective range predicate on EACH column we count
the files a footer-stats reader must open (pyarrow min/max per file —
the same skipping decision Spark's parquet scan and the versioned-zone
pruner make) and time the filtered Spark read.

Expected shape: range sort ≈ perfect skipping on its sort column, none
on the other; Z-order ≈ strong skipping on BOTH (each file is a small
hyper-cube); the hash baseline keeps every file for every predicate.

Run: python scripts/zorder_prune_bench.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 32
COLS = ["l_orderkey", "l_partkey"]


def files_kept(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(kept, total) parquet files whose footer [min, max] on `col`
    intersects [lo, hi] — the file-skipping decision, engine-free."""
    import pyarrow.parquet as pq

    kept = total = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if not mins or (min(mins) <= hi and max(maxs) >= lo):
            kept += 1  # absent stats keep the file (never a false skip)
    return kept, total


def timed_read(spark, path: str, col: str, lo: int, hi: int) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


if __name__ == "__main__":
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import medallion
    from realtime_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="zorder-prune-bench")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        *COLS, "l_quantity", "l_extendedprice"
    )
    stats = li.agg(
        *[F.max(c).alias(c) for c in COLS]
    ).collect()[0]
    # ~3% selectivity window per column, mid-domain
    preds = {
        c: (int(stats[c] * 0.50), int(stats[c] * 0.53)) for c in COLS
    }

    out = {"sf_dir": sf_dir, "n_files": N_FILES, "cols": COLS, "layouts": {}}
    with tempfile.TemporaryDirectory() as td:
        layouts = {}
        p = os.path.join(td, "hash")
        li.repartition(N_FILES).write.parquet(p)
        layouts["hash_baseline"] = p
        p = os.path.join(td, "range_sorted")
        medallion.write_range_sorted(li, p, COLS[0], N_FILES)
        layouts["range_sorted_col0"] = p
        p = os.path.join(td, "zordered")
        medallion.write_zordered(li, p, COLS, N_FILES)
        layouts["zordered"] = p

        for name, path in layouts.items():
            entry = {}
            for c in COLS:
                lo, hi = preds[c]
                kept, total = files_kept(path, c, lo, hi)
                entry[c] = {
                    "kept_files": kept,
                    "total_files": total,
                    "read_sec": timed_read(spark, path, c, lo, hi),
                }
            out["layouts"][name] = entry
            print(f"# {name}: " + ", ".join(
                f"{c} keeps {entry[c]['kept_files']}/"
                f"{entry[c]['total_files']} files"
                for c in COLS
            ), file=sys.stderr)

    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ZORDER_PRUNE.json",
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": dest}))
    spark.stop()
