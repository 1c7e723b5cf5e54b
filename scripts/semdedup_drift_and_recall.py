"""Semantic-dedup incremental drift + quantizer recall (round-8 verdict
#3a / #4).

Part A — incremental drift: the embeddings corpus is split into N=10
deterministic pseudo-daily batches (hash of vec_id) and ingested in order
through `similarity.incremental_semantic_dedup` against one growing
kept-vector index. After every batch, detection is scored against EXACT
all-pairs cosine ground truth (computed densely on the driver — 2000×64
is a trivial matmul; the point of the study is the operator, not the
oracle). Detection semantics are the operator's own: a true pair
(cos >= τ) counts as detected iff at most one member survives. The final
kept set is compared with the ONE-SHOT `semantic_dedup` on the union —
the two differ by DESIGN on dominance chains (greedy-kept vs one-shot
dominance, pinned in tests/test_similarity.py), so the artifact counts
that delta instead of pretending parity. A second batch split (different
seed) measures ingestion-order drift.

Part B — quantizer recall at matched cell count: the SemDeDup recall
boundary is the coarse quantizer (cross-cell pairs are invisible). For
the deterministic orthant quantizer (n_bits=8 → 256 cells) vs the
trained k-means quantizer (256 centroids), report: recall of true pairs
sharing a cell and the achieved pruning factor (all-pairs / Σ|cell|²),
at τ=0.5 (the tightest populated regime — this fixture's max off-diagonal
cosine is 0.60, so τ≥0.7 regimes are empty here) and τ=0.35 (the declared
query's threshold, and the loose-similarity regime where round-7's sweep
showed hyperplane banding weak). This is the measured basis for promoting
trained-IVF cells as the default quantizer for τ < 0.5.

Output: merges "semdedup_incremental_drift" and
"semdedup_quantizer_recall" into LSH_RECALL.json.

Run: python scripts/semdedup_drift_and_recall.py [sf_dir]  (default sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get(
    "PYTHONPATH", ""
)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 10
TAU = 0.35
N_BITS = 8
SEEDS = (7, 23)  # two batch splits -> ingestion-order drift


def load_dense(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, x


def true_pairs(ids, x, tau):
    """Exact all-pairs cosine ground truth, upper triangle, cos >= tau."""
    n = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    # round to 6 like the operator so boundary pairs agree
    sims = np.round(n @ n.T, 6)
    iu, ju = np.triu_indices(len(ids), k=1)
    mask = sims[iu, ju] >= tau
    return {(int(ids[a]), int(ids[b])) for a, b in zip(iu[mask], ju[mask])}


def drift_run(spark, sf_dir, pairs, seed):
    from realtime_data_pipeline_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb = emb.withColumn(
        "__batch",
        F.pmod(F.xxhash64("vec_id", F.lit(seed)), F.lit(N_BATCHES)).cast(
            "int"
        ),
    ).persist()
    batch_of = {
        r["vec_id"]: r["__batch"]
        for r in emb.select("vec_id", "__batch").collect()
    }

    td = tempfile.mkdtemp(prefix="semdedup_drift_")
    idx = os.path.join(td, "sem_idx")
    survivors: set[int] = set()
    per_batch = []
    t_incr = 0.0
    try:
        for b in range(N_BATCHES):
            batch = emb.filter(F.col("__batch") == b).select(
                "vec_id", "embedding"
            )
            t0 = time.perf_counter()
            fresh, metrics = similarity.incremental_semantic_dedup(
                batch, idx, threshold=TAU, n_bits=N_BITS
            )
            fresh_ids = {r["vec_id"] for r in fresh.select("vec_id").collect()}
            t_incr += time.perf_counter() - t0
            survivors |= fresh_ids
            arrived = [
                (s, p)
                for (s, p) in pairs
                if batch_of[s] <= b and batch_of[p] <= b
            ]
            detected = [
                (s, p) for (s, p) in arrived if not ({s, p} <= survivors)
            ]
            per_batch.append(
                {
                    "batch": b,
                    "batch_rows": int(metrics["batch_rows"]),
                    "fresh_rows": int(metrics["fresh_rows"]),
                    "corpus_dups": int(metrics["corpus_dups"]),
                    "pairs_arrived": len(arrived),
                    "pairs_detected": len(detected),
                    "recall_cum": round(len(detected) / len(arrived), 4)
                    if arrived
                    else None,
                }
            )
            print(f"# seed {seed} batch {b}: {per_batch[-1]}", file=sys.stderr)
    finally:
        emb.unpersist()
        shutil.rmtree(td, ignore_errors=True)
    return survivors, per_batch, round(t_incr, 2)


def main() -> None:
    from realtime_data_pipeline_spark import similarity
    from realtime_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="semdedup-drift")
    ids, x = load_dense(spark, sf_dir)
    pairs = true_pairs(ids, x, TAU)
    print(f"# {len(ids)} vectors, {len(pairs)} true pairs @ tau={TAU}",
          file=sys.stderr)

    # --- Part A: incremental drift ------------------------------------
    runs = {}
    for seed in SEEDS:
        survivors, per_batch, t_incr = drift_run(spark, sf_dir, pairs, seed)
        runs[seed] = (survivors, per_batch, t_incr)

    # one-shot on the union (the quantizer-bounded reference)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.perf_counter()
    one_shot = similarity.semantic_dedup(emb, threshold=TAU, n_bits=N_BITS)
    os_kept = {
        r["vec_id"] for r in one_shot.filter("is_kept").collect()
    }
    t_os = round(time.perf_counter() - t0, 2)

    def recall(surv: set) -> float:
        det = sum(1 for (s, p) in pairs if not ({s, p} <= surv))
        return round(det / len(pairs), 4) if pairs else 1.0

    s7, pb7, t7 = runs[SEEDS[0]]
    s23, pb23, t23 = runs[SEEDS[1]]
    drift = {
        "sf_dir": sf_dir,
        "n_batches": N_BATCHES,
        "tau": TAU,
        "n_bits": N_BITS,
        "true_pairs": len(pairs),
        "recall_vs_batches": pb7,
        "final": {
            "incremental_kept": len(s7),
            "incremental_recall": recall(s7),
            "one_shot_kept": len(os_kept),
            "one_shot_recall": recall(os_kept),
            # greedy-kept vs one-shot dominance divergence, counted:
            "kept_incr_not_oneshot": len(s7 - os_kept),
            "kept_oneshot_not_incr": len(os_kept - s7),
        },
        "order_drift_second_split": {
            "kept": len(s23),
            "recall": recall(s23),
            "kept_symmetric_diff_vs_first_split": len(s7 ^ s23),
        },
        "incremental_total_sec": t7,
        "one_shot_sec": t_os,
    }
    print(f"# drift: {drift['final']}", file=sys.stderr)

    # --- Part B: quantizer recall at matched cell count ----------------
    emb_sel = emb.select("vec_id", "embedding")
    quant = {}
    all_pairs_n = len(ids) * (len(ids) - 1) // 2

    def cell_stats(assign: dict[int, int], tau: float) -> dict:
        tp = pairs if tau == TAU else true_pairs(ids, x, tau)
        same = sum(1 for (s, p) in tp if assign[s] == assign[p])
        from collections import Counter

        sizes = Counter(assign.values())
        cand = sum(c * (c - 1) // 2 for c in sizes.values())
        return {
            "true_pairs": len(tp),
            "recall": round(same / len(tp), 4) if tp else 1.0,
            "candidate_pairs": cand,
            "pruning_x": round(all_pairs_n / cand, 1) if cand else None,
            "occupied_cells": len(sizes),
        }

    orthant_assign = {
        r["vec_id"]: r["b"]
        for r in emb_sel.select(
            "vec_id",
            similarity.orthant_bucket(F.col("embedding"), N_BITS).alias("b"),
        ).collect()
    }
    cents = similarity.train_centroids_kmeans(
        emb_sel, 2**N_BITS, sample_size=4096
    )
    ivf_assign = {
        r["vec_id"]: int(r["c"][0])
        for r in emb_sel.select(
            "vec_id",
            similarity.ivf_cells_udf(cents, 1)(F.col("embedding")).alias("c"),
        ).collect()
    }
    for tau in (0.5, 0.35):
        quant[f"tau_{tau}"] = {
            "orthant_8bit": cell_stats(orthant_assign, tau),
            "kmeans_256": cell_stats(ivf_assign, tau),
        }
        print(f"# quantizer tau={tau}: {quant[f'tau_{tau}']}", file=sys.stderr)

    art = os.path.join(_REPO_ROOT, "LSH_RECALL.json")
    doc = json.load(open(art)) if os.path.exists(art) else {}
    doc["semdedup_incremental_drift"] = drift
    doc["semdedup_quantizer_recall"] = {
        "sf_dir": sf_dir,
        "cells": 2**N_BITS,
        "note": (
            "recall = share of exact-cosine true pairs whose members share "
            "a quantizer cell (the SemDeDup visibility bound); pruning_x = "
            "all-pairs / sum(|cell| choose 2). Same cell budget both rows."
        ),
        **quant,
    }
    with open(art, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"semdedup_incremental_drift": drift,
                      "semdedup_quantizer_recall": quant}))
    spark.stop()


if __name__ == "__main__":
    main()
