"""Price the two round-8 bloom paths at sf0.1 → BLOOM_PRUNE.json.

Two independent claims get numbers instead of prose:

1. **Zone point-lookup file skipping** (`versioned.commit_version(
   bloom_cols=...)`): events (100k rows) committed as 10 appends split
   by xxhash64(event_id) — the adversarial layout for min/max stats:
   every file's [min, max] spans the whole key domain, so range stats
   keep ALL files for `event_id = v` while the per-file bloom keeps
   only the one file whose hash class holds the key. Reported: files
   kept by stats-only vs stats+bloom, manifest overhead bytes, and
   min-of-N wall time for the pruned read vs the full-scan filter.

2. **Cross-stage join pre-filter** (`sketches.bloom_prefilter`): the
   contamination scan's corpus side, measured as the exact query vs its
   bloom-prefiltered twin plus the scan-side reduction (train grams
   entering the distinct/join exchanges before vs after the
   pre-filter). Outputs are hash-compared — identical by construction.

Timing reuses bench.py's steal-robust min-of-N helper (this VM has
documented CPU-steal windows; every leg records per-pass steal ticks).

Run: python scripts/bloom_prune_bench.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get(
    "PYTHONPATH", ""
)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (steal-robust _bench_leg + STEAL)


def zone_point_lookup(spark, sf_dir: str, root: str) -> dict:
    from realtime_data_pipeline_spark import versioned

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_commits = 10
    for i in range(n_commits):
        versioned.commit_version(
            events.filter(
                F.pmod(F.xxhash64("event_id"), F.lit(n_commits)) == i
            ).coalesce(2),
            root,
            mode="append",
            bloom_cols=["event_id"],
            # ~10k distinct keys land in each commit's file: the 1 KiB
            # default (sized for ~1k/file) would saturate, so size the
            # bitmap to the file cardinality — 16 KiB ≈ 13 bits/key
            # ≈ 0.5% fp. Sizing is a caller knob exactly like
            # sketches.bloom_build's expected_items.
            bloom_bits=1 << 17,
        )
    man = versioned._read_manifest(root, n_commits - 1)
    total = len(man["files"])
    probe_key = int(
        events.select("event_id").orderBy("event_id").limit(1001).tail(1)[0][0]
    )
    preds = [("event_id", "=", probe_key)]
    stats_only = sum(
        1
        for f in man["files"]
        if versioned._file_may_match(man["file_stats"].get(f), preds)
    )
    rep = versioned.prune_report(root, preds)
    bloom_bytes = sum(
        len(ent["b64"]) * 3 // 4
        for per_file in man.get("file_blooms", {}).values()
        for ent in per_file.values()
    )

    def full():
        versioned.read_version(spark, root).filter(
            F.col("event_id") == probe_key
        ).collect()

    def pruned():
        versioned.read_version_where(spark, root, preds).collect()

    t_full = bench._bench_leg("zone_lookup_full_scan", full)
    t_pruned = bench._bench_leg("zone_lookup_bloom_pruned", pruned)
    assert (
        versioned.read_version_where(spark, root, preds).count()
        == versioned.read_version(spark, root)
        .filter(F.col("event_id") == probe_key)
        .count()
        == 1
    )
    return {
        "total_files": total,
        "kept_files_stats_only": stats_only,
        "kept_files_with_bloom": rep["kept_files"],
        "manifest_bloom_bytes": bloom_bytes,
        "t_full_scan_sec": round(t_full, 3),
        "t_bloom_pruned_sec": round(t_pruned, 3),
        "speedup": round(t_full / t_pruned, 2) if t_pruned else None,
    }


def contamination_prefilter(spark, sf_dir: str) -> dict:
    from realtime_data_pipeline_spark import sketches
    from realtime_data_pipeline_spark.neardup import word_shingles
    from realtime_data_pipeline_spark.queries.curation import (
        docs_contamination_check,
        docs_contamination_check_bloom,
    )

    def digest(df):
        return df.select(
            F.md5(
                F.concat_ws(
                    "|", *[F.col(c).cast("string") for c in sorted(df.columns)]
                )
            ).alias("h")
        ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long"))).first()[0]

    exact_hash = digest(docs_contamination_check(spark, sf_dir))
    bloom_hash = digest(docs_contamination_check_bloom(spark, sf_dir))
    assert exact_hash == bloom_hash, "bloom twin diverged from exact check"

    # scan-side reduction: train grams entering the exchanges
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    split = F.when(
        F.substring(F.md5(F.col("text")), 1, 1) <= "c", F.lit("train")
    ).otherwise(F.lit("eval"))
    base = docs.select(
        split.alias("split"),
        F.array_distinct(
            F.transform(
                word_shingles(F.col("text"), 5), lambda g: F.xxhash64(g)
            )
        ).alias("grams"),
    )
    train_all = base.filter(F.col("split") == "train").select(
        F.explode("grams").alias("g")
    )
    eval_grams = base.filter(F.col("split") == "eval").select(
        F.explode("grams").alias("g")
    )
    bloom = sketches.bloom_build(
        eval_grams, "g", expected_items=200_000, fpp=0.01
    )
    n_train = train_all.count()
    n_candidates = sketches.bloom_prefilter(train_all, "g", bloom).count()

    t_exact = bench._bench_leg(
        "contamination_exact",
        lambda: docs_contamination_check(spark, sf_dir).collect(),
    )
    t_bloom = bench._bench_leg(
        "contamination_bloom_prefilter",
        lambda: docs_contamination_check_bloom(spark, sf_dir).collect(),
    )
    return {
        "outputs_hash_equal": True,
        "train_gram_rows": n_train,
        "candidate_rows_after_prefilter": n_candidates,
        "shuffle_reduction": round(n_train / max(n_candidates, 1), 2),
        "t_exact_sec": round(t_exact, 3),
        "t_bloom_sec": round(t_bloom, 3),
    }


def isolated_prefilter_join(spark) -> dict:
    """The operator's own scale regime, isolated from the fixture: a
    50M-row fact side joined to a 5M-key reference side — too big to
    broadcast (40 MB of longs), so the plain join shuffles all 50M
    rows, while the bloom (6 MB bitmap riding a 1-row broadcast)
    prefilters the fact side down to matches + ~1% fp before the
    exchange. The contamination twin above shows the operator's FIXED
    cost (bloom build + bitmap collect, O(reference), dominates at
    fixture scale); this leg shows the term that grows with the
    corpus."""
    from realtime_data_pipeline_spark import sketches

    big = spark.range(50_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(5_000_000).select(
        (F.col("id") + F.lit(10_000_000)).alias("k")
    )

    def plain():
        big.join(small, "k").count()

    n_match = big.join(small, "k").count()
    bloom = sketches.bloom_build(
        small, "k", expected_items=5_000_000, fpp=0.01
    )
    bloom = bloom.persist()
    n_candidates = sketches.bloom_prefilter(big, "k", bloom).count()

    def pre():
        sketches.bloom_prefilter(big, "k", bloom).join(small, "k").count()

    assert (
        sketches.bloom_prefilter(big, "k", bloom).join(small, "k").count()
        == n_match
    )
    t_plain = bench._bench_leg("isolated_join_plain", plain)
    t_pre = bench._bench_leg("isolated_join_bloom_prefiltered", pre)
    bloom.unpersist()
    return {
        "big_rows": 50_000_000,
        "reference_keys": 5_000_000,
        "match_rows": n_match,
        "candidate_rows_after_prefilter": n_candidates,
        "shuffle_reduction": round(50_000_000 / max(n_candidates, 1), 2),
        "t_plain_join_sec": round(t_plain, 3),
        "t_prefiltered_join_sec": round(t_pre, 3),
        "speedup": round(t_plain / t_pre, 2) if t_pre else None,
    }


def isolated_prefilter_join_wide(spark) -> dict:
    """The regime where the prefilter PAYS (the round-9 decision-rule
    leg): same key distribution as :func:`isolated_prefilter_join` but
    the fact rows carry a ~200-byte payload — the realistic shape of a
    document/event table, where the exchange moves row BYTES, not just
    keys. The plain join shuffles every payload byte; the prefilter
    drops ~98.5% of rows (matches + ~1% fp survive) before the
    exchange for 2 hashes + k bit-tests per row. Narrow-key result
    stays in the sibling leg as the honest counter-regime: on
    local[32]'s memory-speed shuffle, key-only rows don't repay even
    the cheap probe."""
    from realtime_data_pipeline_spark import sketches

    n_big, n_small = 40_000_000, 5_000_000
    big = spark.range(n_big).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).alias("k"),
        F.concat(
            F.lit("payload-"), F.lpad(F.col("id").cast("string"), 12, "0"),
            F.repeat(F.lit("x"), 380),
        ).alias("payload"),
    )
    small = spark.range(n_small).select(
        (F.col("id") + F.lit(10_000_000)).alias("k")
    )

    def plain():
        big.join(small, "k").agg(
            F.count(F.lit(1)), F.max(F.length("payload"))
        ).collect()

    n_match = big.join(small, "k").count()
    bloom = sketches.bloom_build(
        small, "k", expected_items=n_small, fpp=0.01
    ).persist()

    def pre():
        sketches.bloom_prefilter(big, "k", bloom).join(small, "k").agg(
            F.count(F.lit(1)), F.max(F.length("payload"))
        ).collect()

    n_candidates = sketches.bloom_prefilter(big, "k", bloom).count()
    assert (
        sketches.bloom_prefilter(big, "k", bloom).join(small, "k").count()
        == n_match
    )
    t_plain = bench._bench_leg("isolated_wide_join_plain", plain)
    t_pre = bench._bench_leg("isolated_wide_join_bloom_prefiltered", pre)
    bloom.unpersist()
    return {
        "big_rows": n_big,
        "payload_bytes_per_row": 400,
        "reference_keys": n_small,
        "match_rows": n_match,
        "candidate_rows_after_prefilter": n_candidates,
        "shuffle_reduction": round(n_big / max(n_candidates, 1), 2),
        "t_plain_join_sec": round(t_plain, 3),
        "t_prefiltered_join_sec": round(t_pre, 3),
        "speedup": round(t_plain / t_pre, 2) if t_pre else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from realtime_data_pipeline_spark.session import get_spark

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    tmp = tempfile.mkdtemp(prefix="bloom_prune_")
    try:
        out = {
            "sf_dir": sf_dir,
            "zone_point_lookup": zone_point_lookup(
                spark, sf_dir, os.path.join(tmp, "zone")
            ),
            "join_prefilter": contamination_prefilter(spark, sf_dir),
            "isolated_prefilter_join": isolated_prefilter_join(spark),
            "isolated_prefilter_join_wide": isolated_prefilter_join_wide(
                spark
            ),
            "steal": bench.STEAL,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    path = os.path.join(_REPO_ROOT, "BLOOM_PRUNE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "steal"}, indent=2))


if __name__ == "__main__":
    main()
