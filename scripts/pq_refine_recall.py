"""PQ / IVF×PQ recall sweep with the exact-refine stage (round-10
verdict #2).

Measures recall@10 against the exact brute-force scan at sf0.1 for:
  - bare PQ/ADC (m=8, 256 codes) and PQ + refine (k' = 100),
  - IVF×PQ at nprobe 2/4/8/16 of 16 trained cells, bare and refined,
  - the pure-IVF exact search at the same nprobes (the probe-coverage
    BOUND refine converges to — quantization error removed, only
    cells-not-probed remain).

The refine stage re-ranks ONLY the ADC stage's k' candidates with the
exact brute-force scoring spelling, so (ivf_pq + refine) recall should
track ivf_knn's at every nprobe, and plain (pq + refine) should approach
1.0. Output: merges "pq_refine_recall" into LSH_RECALL.json.

Run: python scripts/pq_refine_recall.py [sf_dir]  (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get(
    "PYTHONPATH", ""
)

from pyspark.sql import functions as F  # noqa: E402

K = 10
REFINE_K = 100
N_QUERIES = 50
# two coarse-quantizer budgets: the 16-cell config every prior round
# measured, and a FAISS-typical sqrt(N)-ish 64-cell config — finer cells
# raise the probe-coverage bound at the SAME scanned fraction
CELL_CONFIGS = {16: (2, 4, 8, 16), 64: (4, 8, 16, 32)}


def main() -> None:
    from realtime_data_pipeline_spark import similarity
    from realtime_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="pq-refine-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_knn(emb, queries, k=K).collect()
    }

    def recall(df) -> float:
        got = {(r.query_id, r.vec_id) for r in df.collect()}
        return round(len(got & exact) / len(exact), 4)

    books = similarity.train_pq_codebooks(emb, m=8, n_codes=256)
    codes = similarity.pq_encode(emb, books).persist()
    codes.count()

    out: dict = {
        "sf_dir": sf_dir,
        "k": K,
        "refine_k": REFINE_K,
        "n_queries": N_QUERIES,
        "pq_m": 8,
        "pq_codes": 256,
        "note": (
            "recall@10 vs exact brute force. refine = ADC generates "
            f"k'={REFINE_K} candidates, exact re-rank of only those "
            "vectors; ivf_exact is the probe-coverage bound refine "
            "converges to (quantization error removed). scan_frac = "
            "nprobe/cells, the corpus share each query reads."
        ),
    }
    out["pq_bare"] = recall(
        similarity.pq_knn(emb, queries, k=K, codebooks=books, codes=codes)
    )
    out["pq_refine"] = recall(
        similarity.pq_knn(
            emb, queries, k=K, codebooks=books, codes=codes,
            refine_k=REFINE_K,
        )
    )
    # refine-width sensitivity: the gap to 1.0 at k'=100 is candidate-
    # generation miss (true neighbors outside the ADC top-100), so a
    # wider k' must close it
    out["pq_refine_k400"] = recall(
        similarity.pq_knn(
            emb, queries, k=K, codebooks=books, codes=codes, refine_k=400,
        )
    )
    print(
        f"# pq bare={out['pq_bare']} refine={out['pq_refine']} "
        f"refine_k400={out['pq_refine_k400']}",
        file=sys.stderr,
    )
    by_cells = {}
    for n_cells, nprobes in CELL_CONFIGS.items():
        cents = similarity.train_centroids_kmeans(emb, n_centroids=n_cells)
        per_probe = {}
        for nprobe in nprobes:
            row = {
                "scan_frac": round(nprobe / n_cells, 3),
                "ivf_pq_bare": recall(
                    similarity.ivf_pq_knn(
                        emb, queries, k=K, codebooks=books, centroids=cents,
                        nprobe=nprobe,
                    )
                ),
                "ivf_pq_refine": recall(
                    similarity.ivf_pq_knn(
                        emb, queries, k=K, codebooks=books, centroids=cents,
                        nprobe=nprobe, refine_k=REFINE_K,
                    )
                ),
                "ivf_exact_bound": recall(
                    similarity.ivf_knn(
                        emb, queries, k=K, nprobe=nprobe, centroids=cents,
                    )
                ),
                # SPANN-style multi-assignment (corpus vectors replicated
                # into top-2 cells): raises the probe bound itself at the
                # same nprobe, for a 2x index. Paired with refine.
                "ivf_pq_refine_assign2": recall(
                    similarity.ivf_pq_knn(
                        emb, queries, k=K, codebooks=books, centroids=cents,
                        nprobe=nprobe, refine_k=REFINE_K, corpus_assign=2,
                    )
                ),
            }
            per_probe[f"nprobe_{nprobe}"] = row
            print(f"# cells={n_cells} nprobe={nprobe}: {row}",
                  file=sys.stderr)
        by_cells[f"cells_{n_cells}"] = per_probe
    out["by_cells"] = by_cells
    codes.unpersist()

    art = os.path.join(_REPO_ROOT, "LSH_RECALL.json")
    doc = json.load(open(art)) if os.path.exists(art) else {}
    doc["pq_refine_recall"] = out
    with open(art, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"pq_refine_recall": out}))
    spark.stop()


if __name__ == "__main__":
    main()
