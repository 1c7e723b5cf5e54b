"""X3 similarity-search queries over the ``embeddings`` fixture.

Brute-force cosine top-k is DuckDB-oracle-checked (both engines do
index-ordered double arithmetic; orderings use round-6 sims with id
tiebreaks). The LSH variant is rows-only — recall is approximate by design;
its quality gate lives in ``tests/test_similarity.py`` (recall@10 vs the
exact baseline).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import lsh, similarity
from realtime_data_pipeline_spark.ops import topk_per_group
from realtime_data_pipeline_spark.queries.core import load

N_QUERIES = 5
K = 10


def embedding_dims_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    vec = similarity.as_double_array(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.round(similarity.l2_norm(vec), 4).alias("l2_norm"),
    )


EMBEDDING_DIMS_NORMS_SQL = """
SELECT vec_id,
       label,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
             x -> x * x))), 4) AS l2_norm
FROM embeddings
"""


def _query_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def embedding_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load(spark, sf_dir, "embeddings")
    return similarity.brute_force_knn(corpus, _query_set(spark, sf_dir), k=K)


EMBEDDING_KNN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
  SELECT q.query_id,
         e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 6)
           AS sim6
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, sim6,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY sim6 DESC, vec_id ASC) AS rn
  FROM pairs
)
SELECT query_id, vec_id, ROUND(sim6, 4) AS sim, CAST(rn AS INTEGER) AS rank
FROM ranked WHERE rn <= {K}
"""


def embedding_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path: banded SimHash-LSH candidates + exact cosine re-rank.
    16 bands × 2 bits keeps recall high on the (unclustered) synthetic
    fixture; real corpora tighten bands as similarity structure appears.
    Rows-only: approximate recall has no SQL oracle."""
    corpus = load(spark, sf_dir, "embeddings")
    queries = _query_set(spark, sf_dir)
    planes = lsh.random_hyperplanes(n_planes=32, dim=64, seed=42)
    cands = lsh.lsh_candidate_pairs(queries, corpus, planes, n_bands=16)
    cands = cands.filter(F.col("vec_id") != F.col("query_id"))
    rejoined = (
        cands.join(
            corpus.select("vec_id", similarity.as_double_array(
                F.col("embedding")).alias("__vec")),
            "vec_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    "query_id",
                    similarity.as_double_array(F.col("query_vec")).alias("__qvec"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "vec_id",
            F.round(similarity.cosine(F.col("__qvec"), F.col("__vec")), 6).alias(
                "sim6"
            ),
        )
    )
    top = topk_per_group(
        rejoined, ["query_id"], [F.col("sim6").desc(), F.col("vec_id").asc()], k=K
    )
    return top.select(
        "query_id",
        "vec_id",
        F.round(F.col("sim6"), 4).alias("sim"),
        F.col("rn").cast("int").alias("rank"),
    )


def embedding_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path #2: IVF coarse quantization — probe 4 of 16 cells, exact
    re-rank within. The quantizer is TRAINED (driver-side spherical
    k-means on a deterministic sample, broadcast out) — recall@10 gains
    ~0.15 over random centroids at the same nprobe on the fixture.
    Rows-only (approximate recall; gates in tests/test_similarity.py)."""
    corpus = load(spark, sf_dir, "embeddings")
    cents = similarity.train_centroids_kmeans(corpus, n_centroids=16)
    return similarity.ivf_knn(
        corpus,
        _query_set(spark, sf_dir),
        k=K,
        n_centroids=16,
        nprobe=4,
        centroids=cents,
    )



def embedding_knn_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path #4 (r12): PCA-reduced candidate generation + exact
    full-space re-rank (reduction.pca_knn) — pca_k/d of the scan FLOPs
    for the candidate pass, recall measured in
    LSH_RECALL.json#pca_ann_recall and gated in tests/test_reduction.py.
    Rows-only (approximate by construction)."""
    from realtime_data_pipeline_spark import reduction

    corpus = load(spark, sf_dir, "embeddings")
    return reduction.pca_knn(
        corpus, _query_set(spark, sf_dir), k=K, cand=100, pca_k=24
    )


def embedding_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path #3: product quantization + asymmetric distance — the
    corpus scans as m-byte PQ codes (64× compression at m=8 over 64-dim
    float64), per-task LUT gathers instead of dot products, partial
    top-k per partition. Measured recall@10 vs the exact scan: 0.67–0.71
    at m=8/256 codes, 0.80 at m=16 (sf0.001/sf0.01). Rows-only
    (approximate; recall gated in tests/test_similarity.py)."""
    corpus = load(spark, sf_dir, "embeddings")
    books = similarity.train_pq_codebooks(corpus, m=8, n_codes=256)
    return similarity.pq_knn(
        corpus, _query_set(spark, sf_dir), k=K, codebooks=books
    )


SIM_THRESHOLD = 0.35
PAIR_N = 300


def embeddings_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, exact small-N baseline (oracle): all
    pairs above the similarity threshold among the first PAIR_N vectors.
    The crossJoin is the guarded small-N fallback; the corpus-scale path
    is embeddings_neardup_lsh."""
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < PAIR_N)
        .select("vec_id", similarity.as_double_array(F.col("embedding")).alias("v"))
        .select("vec_id", "v", similarity.l2_norm(F.col("v")).alias("n"))
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                similarity.dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("sim6"),
        )
        .filter(F.col("sim6") >= SIM_THRESHOLD)
        .select("id_a", "id_b", F.round(F.col("sim6"), 4).alias("sim"))
    )


EMBEDDINGS_COSINE_PAIRS_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {PAIR_N}
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim6
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(sim6, 4) AS sim
FROM p WHERE sim6 >= {SIM_THRESHOLD}
"""


def embeddings_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: banded hyperplane LSH self-pairing +
    exact cosine verify (rows-only; recall gated in tests/test_similarity.py
    against the exact subset).

    Band geometry must match the similarity regime: collision prob per
    band is p^r with p = 1-θ/π. This fixture's threshold (0.35 — the
    synthetic corpus has no high-sim pairs) gives p≈0.61, so r=4/b=8
    lands ~0.71 recall with 16-bucket band keys. A REAL near-dup corpus
    (sim ≥ 0.9, p≈0.86) runs r=8+/b=8 — 256-bucket keys, ~256× candidate
    pruning — which a 0.35 threshold cannot have: at low thresholds the
    pair density is itself quadratic, and no banding geometry prunes what
    the threshold keeps."""
    emb = load(spark, sf_dir, "embeddings")
    left = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    planes = lsh.random_hyperplanes(n_planes=32, dim=64, seed=42)
    cands = lsh.lsh_candidate_pairs(left, emb, planes, n_bands=8).filter(
        F.col("query_id") < F.col("vec_id")
    )
    va = emb.select(
        F.col("vec_id").alias("query_id"),
        similarity.as_double_array(F.col("embedding")).alias("va"),
    ).select("query_id", "va", similarity.l2_norm(F.col("va")).alias("na"))
    vb = emb.select(
        "vec_id", similarity.as_double_array(F.col("embedding")).alias("vb")
    ).select("vec_id", "vb", similarity.l2_norm(F.col("vb")).alias("nb"))
    return (
        cands.join(va, "query_id")
        .join(vb, "vec_id")
        .select(
            F.col("query_id").alias("id_a"),
            F.col("vec_id").alias("id_b"),
            F.round(
                similarity.dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("sim6"),
        )
        .filter(F.col("sim6") >= SIM_THRESHOLD)
        .select("id_a", "id_b", F.round(F.col("sim6"), 4).alias("sim"))
    )


SEMDEDUP_TAU = 0.35
SEMDEDUP_BITS = 8


def embeddings_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped embedding-space dedup (similarity.semantic_dedup):
    orthant-bucketed within-bucket cosine, declarative keep-min-id
    dominance rule. Oracle-checkable end to end because the coarse
    quantizer is the deterministic sign-bit bucket; τ=0.35 yields
    non-trivial drops at every SF on the synthetic corpus (5/7/93 at
    sf0.001/0.01/0.1). The trained-k-means bucket variant is the
    rows-only scale path (tests/test_similarity.py).

    Oracle boundary: the SQL twin uses list_cosine_similarity, which on
    an all-zero vector yields NaN (DuckDB orders NaN largest → would
    drop) where the Spark side's floored norm yields 0 (→ keeps). The
    fixture has no zero vectors; the Spark-side behavior is the
    deliberate production semantic (zero embedding = no similarity
    evidence) and is pinned in tests/test_similarity.py."""
    emb = load(spark, sf_dir, "embeddings")
    marked = similarity.semantic_dedup(
        emb, threshold=SEMDEDUP_TAU, n_bits=SEMDEDUP_BITS
    )
    return marked.select(
        "vec_id", "bucket", F.col("is_kept").cast("int").alias("is_kept")
    )


def embeddings_semantic_dedup_ivf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PROMOTED default quantizer path for loose thresholds (round-8
    policy, LSH_RECALL.json#semdedup_quantizer_recall: trained k-means
    cells hold ~9x the pair recall of orthant bits at the same 256-cell
    budget with better pruning): `similarity.semantic_dedup` with
    `centroids=` from `train_centroids_kmeans`. Rows-only by nature —
    the cell assignment is a Pandas-UDF matmul with no SQL twin; the
    pipeline's correctness is carried by the orthant twin
    (`embeddings_semantic_dedup`, oracle) plus the recall/determinism
    gates in tests/test_similarity.py. Uses 64 cells at fixture scale
    (256 would leave ~8 vectors/cell at sf0.01 — training noise)."""
    emb = load(spark, sf_dir, "embeddings")
    cents = similarity.train_centroids_kmeans(emb, 64)
    marked = similarity.semantic_dedup(
        emb, threshold=SEMDEDUP_TAU, centroids=cents
    )
    return marked.select(
        "vec_id", "bucket", F.col("is_kept").cast("int").alias("is_kept")
    )


_SEMDEDUP_BUCKET_SQL = " + ".join(
    f"(CASE WHEN e[{i}] >= 0 THEN {1 << (i - 1)} ELSE 0 END)"
    for i in range(1, SEMDEDUP_BITS + 1)
)

EMBEDDINGS_SEMANTIC_DEDUP_SQL = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
b AS (SELECT vec_id, e, {_SEMDEDUP_BUCKET_SQL} AS bucket FROM v),
dropped AS (
  SELECT DISTINCT b2.vec_id
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
  WHERE ROUND(list_cosine_similarity(a.e, b2.e), 6) >= {SEMDEDUP_TAU}
)
SELECT b.vec_id,
       CAST(b.bucket AS INTEGER) AS bucket,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER)
         AS is_kept
FROM b LEFT JOIN dropped d ON b.vec_id = d.vec_id
"""


def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4-8×
    storage/shuffle shrink for vector indexes. The oracle verifies the
    EXACT quantized bytes (md5 over the int sequence) plus the per-vector
    scale, so any engine-side drift in the floor-plus-half rule fails the
    hash."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "__scale", similarity.quantize_scale(F.col("embedding"))
    )
    _, qvec = similarity.quantize_int8(F.col("embedding"), F.col("__scale"))
    return emb.select(
        "vec_id",
        F.round("__scale", 9).alias("qscale"),
        F.md5(
            F.array_join(F.transform(qvec, lambda x: x.cast("string")), ",")
        ).alias("qvec_md5"),
    )


EMBEDDINGS_QUANTIZE_INT8_SQL = """
WITH s AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS e,
         GREATEST(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> abs(x))), 1e-12) / 127.0
           AS scale
  FROM embeddings
)
SELECT vec_id,
       ROUND(scale, 9) AS qscale,
       md5(array_to_string(
         list_transform(e, x -> CAST(FLOOR(x / scale + 0.5) AS INT)), ','))
         AS qvec_md5
FROM s
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embeddings_cosine_pairs": embeddings_cosine_pairs,
    "embeddings_neardup_lsh": embeddings_neardup_lsh,
    "embedding_dims_norms": embedding_dims_norms,
    "embedding_knn_bruteforce": embedding_knn_bruteforce,
}

# Implemented + recall@10-gated in tests/test_similarity.py, but not declared
# to the 50-slot external driver: embeddings_neardup_lsh already exercises

def embeddings_label_centroid_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Centroid-classifier confusion matrix over the labeled embedding
    fixture — the eval-style workload a curation pipeline runs to check
    whether a labeling (cluster assignment, topic tag, source class)
    is separable in embedding space: per-label mean vector, then every
    vector assigned to its nearest centroid by cosine, counted as
    (label, assigned_label) cells.

    Scale shape: the element-wise centroid aggregation is ONE shuffle of
    (label, dim) pairs — rows × dims exploded positionally, decimal-sum
    averaged (order-independent, engine-identical), reassembled with a
    sort-by-dim collect per label (bounded: labels × dims rows). The
    assignment is a BROADCAST of the tiny centroid table against the
    full corpus (rows × labels comparisons, labels ≪ rows), ranked with
    one per-vector window. No corpus self-join anywhere. Centroid
    components and similarities BOTH round to 6 decimals before
    ranking/output — the cross-engine float discipline every vector
    oracle here uses (and what the DuckDB twin mirrors)."""
    emb = load(spark, sf_dir, "embeddings")
    vec = similarity.as_double_array(F.col("embedding"))
    exploded = emb.select(
        "label", F.posexplode(vec).alias("dim", "val")
    )
    centroids = (
        exploded.groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(38,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda x: x.c,
            ).alias("cvec")
        )
        .select(F.col("label").alias("centroid_label"), "cvec")
    )
    sims = emb.select("vec_id", "label", vec.alias("__v")).join(
        F.broadcast(centroids)
    ).select(
        "vec_id",
        "label",
        "centroid_label",
        F.round(similarity.cosine(F.col("__v"), F.col("cvec")), 6).alias(
            "sim6"
        ),
    )
    assigned = topk_per_group(
        sims,
        ["vec_id"],
        [F.col("sim6").desc(), F.col("centroid_label").asc()],
        k=1,
    )
    return (
        assigned.groupBy("label", F.col("centroid_label").alias("assigned"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "assigned")
        .select(
            "label", "assigned", F.col("n").cast("bigint").alias("n")
        )
    )


EMBEDDINGS_LABEL_CENTROID_CONFUSION_SQL = """
WITH pairs AS (
  SELECT label,
         unnest(list_transform(CAST(embedding AS DOUBLE[]),
                (x, i) -> struct_pack(dim := i - 1, val := x))) AS u
  FROM embeddings
),
exploded AS (
  SELECT label, u.dim AS dim, u.val AS val FROM pairs
),
comp AS (
  SELECT label, dim,
         ROUND(CAST(SUM(CAST(val AS DECIMAL(38,10))) AS DOUBLE)
               / COUNT(*), 6) AS c
  FROM exploded GROUP BY label, dim
),
centroids AS (
  SELECT label AS centroid_label,
         list(c ORDER BY dim) AS cvec
  FROM comp GROUP BY label
),
sims AS (
  SELECT e.vec_id, e.label, c.centroid_label,
         ROUND(list_cosine_similarity(
           CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS sim6
  FROM embeddings e CROSS JOIN centroids c
),
ranked AS (
  SELECT vec_id, label, centroid_label,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY sim6 DESC, centroid_label ASC
         ) AS rn
  FROM sims
)
SELECT label, centroid_label AS assigned, CAST(COUNT(*) AS BIGINT) AS n
FROM ranked WHERE rn = 1
GROUP BY label, centroid_label
ORDER BY label, assigned
"""


# the hyperplane-LSH path driver-side; the kNN-flavored LSH/IVF variants keep
# their pytest gates and stay out of the scarce driver rows.
def embeddings_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (round 12): for every anchor vector, the most
    similar vector carrying a DIFFERENT label — the pair a contrastive /
    embedding-finetune pipeline trains against (easy negatives are
    random; hard negatives are the near-misses that move the decision
    boundary). Top-1 per anchor by cosine, deterministic id tiebreak.

    Scale shape: the exact all-pairs spelling below is the guarded
    small-N oracle baseline (same PAIR_N cross-join budget as
    ``embeddings_cosine_pairs``); at corpus scale the anchor set rides
    the ANN path instead — ``similarity.ivf_pq_knn(refine_k=...)`` top-k
    per anchor, label-mismatch filter, keep rank 1 — trading the
    exactness this oracle pins for probe-bounded cost, with recall
    measured by the same ``LSH_RECALL.json`` machinery. The window here
    runs per-anchor on the pair frame (partitioned by anchor id, never
    a global sort)."""
    from pyspark.sql.window import Window as W

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < PAIR_N)
        .select(
            "vec_id",
            "label",
            similarity.as_double_array(F.col("embedding")).alias("v"),
        )
        .select(
            "vec_id", "label", "v", similarity.l2_norm(F.col("v")).alias("n")
        )
    )
    a = emb.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("anchor_label") != F.col("neg_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            F.round(
                similarity.dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("sim6"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(
        F.col("sim6").desc(), F.col("neg_id").asc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            F.round(F.col("sim6"), 4).alias("sim"),
        )
        .orderBy("anchor_id")
    )


EMBEDDINGS_HARD_NEGATIVES_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {PAIR_N}
), p AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         b.vec_id AS neg_id, b.label AS neg_label,
         ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim6,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(list_cosine_similarity(a.v, b.v), 6) DESC,
                    b.vec_id ASC
         ) AS rn
  FROM e a JOIN e b ON a.label <> b.label
)
SELECT anchor_id, anchor_label, neg_id, neg_label,
       ROUND(sim6, 4) AS sim
FROM p WHERE rn = 1
ORDER BY anchor_id
"""


def embeddings_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact d×d covariance of the embedding corpus as (i, j, cov) rows —
    the oracle face of ``reduction.moments`` (one scan, one geometry-
    bounded partial per partition, ``1+d+d²`` doubles collected; the
    result IS driver-sized by construction, lifted back through the
    Arrow path). DuckDB checks it with COVAR_SAMP over an unnested
    self-join — the quadratic spelling this side never runs."""
    import pandas as pd

    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    _n, rows = reduction.covariance_rows(emb)
    pdf = pd.DataFrame(rows, columns=["i", "j", "cov"])
    return spark.createDataFrame(pdf, "i int, j int, cov double")


EMBEDDINGS_COVARIANCE_SQL = """
WITH x AS (
  SELECT vec_id, CAST(t.i AS INTEGER) AS i,
         CAST(embedding[t.i] AS DOUBLE) AS xi
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
)
SELECT a.i - 1 AS i, b.i - 1 AS j, ROUND(COVAR_SAMP(a.xi, b.xi), 6) AS cov
FROM x a JOIN x b USING (vec_id)
GROUP BY 1, 2
"""


def embeddings_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix from the SAME one-pass moments —
    cov(i,j)/(sd_i·sd_j) — against DuckDB's CORR over the unnested
    self-join. Zero-variance dims yield NULL on both sides."""
    import numpy as np
    import pandas as pd

    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    _n, _mean, cov = reduction.moments(emb)
    sd = np.sqrt(np.diag(cov))
    d = cov.shape[0]
    rows = []
    for i in range(d):
        for j in range(d):
            if sd[i] > 0 and sd[j] > 0:
                rows.append((i, j, round(float(cov[i, j] / (sd[i] * sd[j])), 6)))
            else:
                rows.append((i, j, None))
    pdf = pd.DataFrame(rows, columns=["i", "j", "corr"])
    return spark.createDataFrame(pdf, "i int, j int, corr double")


EMBEDDINGS_CORRELATION_SQL = """
WITH x AS (
  SELECT vec_id, CAST(t.i AS INTEGER) AS i,
         CAST(embedding[t.i] AS DOUBLE) AS xi
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
)
SELECT a.i - 1 AS i, b.i - 1 AS j, ROUND(CORR(a.xi, b.xi), 6) AS corr
FROM x a JOIN x b USING (vec_id)
GROUP BY 1, 2
"""



def embeddings_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance-aware outlier scoring (reduction.mahalanobis_score):
    full-rank whitened squared norm == (x-mu)' Sigma^-1 (x-mu), flagged
    at the chi-square-approx gate d + 3*sqrt(2d). Rows-only by nature
    (eigendecomposition); numpy parity + planted-anomaly gates in
    tests/test_reduction.py."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first().embedding)
    gate = d + 3 * (2 * d) ** 0.5
    scored = reduction.mahalanobis_score(emb)
    return scored.select(
        "vec_id",
        "label",
        F.round("maha2", 4).alias("maha2"),
        (F.col("maha2") > F.lit(gate)).cast("int").alias("flagged"),
    )



def embeddings_label_variances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label per-dimension variance — the diagonal of the GROUPED
    covariance operator (reduction.grouped_covariance: map-side-combined
    per-(partition, group) partials, position-keyed merge, per-group
    assembly over exactly 1+d+d^2 totals rows; fully distributed, no
    driver collect). Oracle: VAR_SAMP over the unnested positions."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "g", F.col("label").cast("string")
    )
    cov = reduction.grouped_covariance(emb, "g")
    return (
        cov.filter(F.col("i") == F.col("j"))
        .select(
            F.col("group").cast("int").alias("label"),
            F.col("i").alias("i"),
            F.round("cov", 6).alias("var"),
        )
    )


EMBEDDINGS_LABEL_VARIANCES_SQL = """
WITH x AS (
  SELECT label, CAST(t.i AS INTEGER) - 1 AS i,
         CAST(embedding[t.i] AS DOUBLE) AS xi
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
)
SELECT label, i, ROUND(VAR_SAMP(xi), 6) AS var
FROM x GROUP BY label, i
HAVING COUNT(*) >= 2
"""



def embeddings_label_anova_f(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension one-way ANOVA F across labels (round-14 build):
    which embedding dimensions carry label signal — the
    feature-relevance audit before a linear probe, and the k-class
    generalization of the Welch-t drift gate. One posexplode scan into
    a (label, dim) grouped agg (shuffle keys bounded at k·d), then a
    d-group combine; pure JVM arithmetic
    (``reduction.label_anova_f``). Oracle: the same between/within
    decomposition over unnested positions."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    out = reduction.label_anova_f(emb, "label", "embedding")
    return out.select(
        "dim", "k", "n", F.round("f", 6).alias("f")
    ).orderBy("dim")


EMBEDDINGS_LABEL_ANOVA_F_SQL = """
WITH x AS (
  SELECT label, CAST(t.i AS INTEGER) - 1 AS dim,
         CAST(embedding[t.i] AS DOUBLE) AS xi
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
  WHERE label IS NOT NULL
), g AS (
  SELECT dim, label, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(xi) AS s, SUM(xi * xi) AS ss
  FROM x GROUP BY dim, label
), d AS (
  SELECT dim, SUM(n) AS nn, SUM(s) AS ss_sum, COUNT(*) AS k,
         SUM(ss - s * s / n) AS ssw, SUM(s * s / n) AS sum_nm2
  FROM g GROUP BY dim
)
SELECT dim,
       CAST(k AS INTEGER) AS k,
       CAST(nn AS BIGINT) AS n,
       CASE WHEN k >= 2 AND nn > k AND ssw > 0
            THEN ROUND(((sum_nm2 - ss_sum * ss_sum / nn) / (k - 1))
                       / (ssw / (nn - k)), 6)
       END AS f
FROM d
ORDER BY dim
"""


def embeddings_label_mi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension binned mutual information with the label (round-14
    build): the nonlinear member of the feature-relevance triad —
    ANOVA's F reads ≈0 on equal-mean classes however different their
    shapes; MI does not. drift_psi's fixed-range binning, one
    posexplode scan, every shuffle bounded at d·k·n_bins
    (``reduction.label_mi``). Oracle: the same binned-MI algebra over
    unnested positions."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    out = reduction.label_mi(emb)
    return out.select(
        "dim", F.round("mi", 6).alias("mi"), "n"
    ).orderBy("dim")


EMBEDDINGS_LABEL_MI_SQL = """
WITH x AS (
  SELECT label,
         CAST(t.i AS INTEGER) - 1 AS dim,
         LEAST(9, GREATEST(0, CAST(FLOOR(
           (CAST(embedding[t.i] AS DOUBLE) - (-4.0)) / 0.8
         ) AS INTEGER))) AS bin
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
  WHERE label IS NOT NULL
), joint AS (
  SELECT dim, label, bin, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM x GROUP BY dim, label, bin
), marg_c AS (
  SELECT dim, label, SUM(cnt) AS c_cnt FROM joint GROUP BY dim, label
), marg_b AS (
  SELECT dim, bin, SUM(cnt) AS b_cnt FROM joint GROUP BY dim, bin
), tot AS (
  SELECT dim, SUM(cnt) AS n FROM joint GROUP BY dim
)
SELECT joint.dim,
       ROUND(SUM((joint.cnt / tot.n)
                 * LN(joint.cnt * tot.n / (marg_c.c_cnt * marg_b.b_cnt))),
             6) AS mi,
       CAST(ANY_VALUE(tot.n) AS BIGINT) AS n
FROM joint
JOIN marg_c USING (dim, label)
JOIN marg_b USING (dim, bin)
JOIN tot USING (dim)
GROUP BY joint.dim
ORDER BY joint.dim
"""


def embeddings_lda_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-LDA projection scores (reduction.lda_train over the
    grouped one-pass totals; k = C-1 supervised directions). Rows-only
    by nature (eigendecomposition); whole-solve numpy parity and the
    LDA-beats-PCA Fisher-criterion gate live in
    tests/test_reduction.py."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "g", F.col("label").cast("string")
    )
    model = reduction.lda_train(emb, "g")
    out = reduction.project(
        emb, model["components"], mean=model["mean"], out_col="lda",
        method="expr",
    )
    cols = [
        F.round(F.element_at("lda", i + 1), 4).alias(f"ld{i + 1}")
        for i in range(min(4, model["components"].shape[0]))
    ]
    return out.select("vec_id", "label", *cols)


PCA_K = 8


def embeddings_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA scores (top-8 components, whitened space available via the
    same model) per vector — rows-only by nature (eigendecomposition is
    not SQL-expressible); numpy parity + variance-ordering gates live in
    tests/test_reduction.py. Projection is map-only JVM codegen."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    model = reduction.pca_train(emb, k=PCA_K)
    out = reduction.pca_project(emb, model, out_col="pca", method="expr")
    cols = [
        F.round(F.element_at("pca", i + 1), 4).alias(f"pc{i + 1}")
        for i in range(PCA_K)
    ]
    return out.select("vec_id", "label", *cols)


def embeddings_dim_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension Population Stability Index between the even-id
    half (reference) and odd-id half (current) of the embedding corpus
    — the ``reduction.drift_psi`` operator: fixed-range equal-width
    histograms (10 bins over [-4, 4], edges clamp), proportion compare
    with ε-smoothing, all JVM column expressions over posexplode rows
    with (side, dim, bin)-bounded shuffle keys. The new-crawl drift
    gate a training pipeline runs before retraining. Oracle: the same
    histogram algebra in DuckDB over UNNEST."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return reduction.drift_psi(ref, cur).orderBy("dim")


EMBEDDINGS_DIM_DRIFT_PSI_SQL = """
WITH ex AS (
  SELECT CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
         CAST(t.i - 1 AS INTEGER) AS dim,
         CAST(embedding[t.i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
),
b AS (
  SELECT side, dim,
         LEAST(9, GREATEST(0,
           CAST(FLOOR((x - (-4.0)) / 0.8) AS INTEGER))) AS bin
  FROM ex
),
c AS (SELECT side, dim, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2, 3),
tt AS (SELECT side, dim, SUM(cnt) AS tot FROM c GROUP BY 1, 2),
p AS (
  SELECT c.side, c.dim, c.bin, CAST(cnt AS DOUBLE) / tot AS p
  FROM c JOIN tt USING (side, dim)
),
w AS (
  SELECT dim, bin,
         SUM(CASE WHEN side = 'ref' THEN p ELSE 0 END) AS p_ref,
         SUM(CASE WHEN side = 'cur' THEN p ELSE 0 END) AS p_cur
  FROM p GROUP BY 1, 2
)
SELECT dim,
       ROUND(SUM((p_cur - p_ref) * LN((p_cur + 1e-6) / (p_ref + 1e-6))),
             6) AS psi
FROM w GROUP BY dim ORDER BY dim
"""


def embeddings_dim_drift_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension Welch t-statistic between the even-id (reference)
    and odd-id (current) corpus halves — ``reduction.drift_ttest``, the
    mean-shift drift gate beside the PSI shape gate. Oracle: the same
    statistic from AVG/VAR_SAMP over UNNEST."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return reduction.drift_ttest(ref, cur).orderBy("dim")


EMBEDDINGS_DIM_DRIFT_TTEST_SQL = """
WITH x AS (
  SELECT CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
         CAST(t.i AS INTEGER) - 1 AS dim,
         CAST(embedding[t.i] AS DOUBLE) AS xi
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
),
s AS (
  SELECT side, dim, COUNT(*) AS n, AVG(xi) AS m, VAR_SAMP(xi) AS v
  FROM x GROUP BY side, dim
)
SELECT r.dim,
       ROUND((c.m - r.m) / SQRT(r.v / r.n + c.v / c.n), 6) AS t,
       r.n AS n_ref, c.n AS n_cur
FROM (SELECT * FROM s WHERE side = 'ref') r
JOIN (SELECT * FROM s WHERE side = 'cur') c USING (dim)
ORDER BY r.dim
"""



def embeddings_dim_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension two-sample Kolmogorov–Smirnov statistic between
    the even-id (reference) and odd-id (current) corpus halves —
    ``reduction.drift_ks``, the DISTRIBUTION-FREE drift gate beside
    PSI (binned shape) and Welch t (mean): the exact sup-distance
    between the two empirical CDFs, blind to nothing a fixed bin grid
    or a moment can hide. Oracle: the same running-CDF max over
    distinct values via a window in DuckDB."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return reduction.drift_ks(ref, cur).orderBy("dim")


EMBEDDINGS_DIM_DRIFT_KS_SQL = """
WITH x AS (
  SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref,
         CAST(t.i AS INTEGER) - 1 AS dim,
         CAST(embedding[t.i] AS DOUBLE) AS xi
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
), counts AS (
  SELECT dim, xi,
         CAST(SUM(is_ref) AS DOUBLE) AS cr,
         CAST(SUM(1 - is_ref) AS DOUBLE) AS cc
  FROM x
  GROUP BY dim, xi
), tot AS (
  SELECT dim, SUM(cr) AS n_ref_d, SUM(cc) AS n_cur_d
  FROM counts GROUP BY dim
), stepped AS (
  SELECT dim, xi,
         SUM(cr) OVER (PARTITION BY dim ORDER BY xi) AS cum_r,
         SUM(cc) OVER (PARTITION BY dim ORDER BY xi) AS cum_c
  FROM counts
)
SELECT s.dim,
       ROUND(MAX(ABS(s.cum_r / t.n_ref_d - s.cum_c / t.n_cur_d)), 6)
         AS ks,
       CAST(ANY_VALUE(t.n_ref_d) AS BIGINT) AS n_ref,
       CAST(ANY_VALUE(t.n_cur_d) AS BIGINT) AS n_cur
FROM stepped s
JOIN tot t USING (dim)
WHERE t.n_ref_d > 0 AND t.n_cur_d > 0
GROUP BY s.dim
ORDER BY s.dim
"""


def embeddings_ridge_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only by nature (driver-side d×d solve): closed-form linear
    probe — ridge-regress the integer label on the embedding in ONE
    distributed pass (``reduction.ridge_fit`` over the augmented
    moments sketch), then score map-only. The "linear probe" a
    representation audit runs to ask how much of a signal is linearly
    decodable from the embedding space. Numpy parity + shrinkage
    behavior gated in tests/test_reduction.py."""
    from realtime_data_pipeline_spark import reduction

    emb = load(spark, sf_dir, "embeddings")
    data = emb.select("vec_id", "embedding", F.col("label").alias("y"))
    model = reduction.ridge_fit(data, "embedding", "y", l2=1e-3)
    return (
        reduction.ridge_predict(data, model)
        .select("vec_id", F.round("y_hat", 6).alias("y_hat"))
        .orderBy("vec_id")
    )


SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # round-13 build: PSI drift monitor vs the histogram-algebra oracle
    "embeddings_dim_drift_psi": embeddings_dim_drift_psi,
    "embeddings_dim_drift_ttest": embeddings_dim_drift_ttest,
    # round-15 build: distribution-free KS drift gate (exact CDF
    # sup-distance over distinct values)
    "embeddings_dim_drift_ks": embeddings_dim_drift_ks,
    # round-13 build: one-pass closed-form linear probe (rows-only)
    "embeddings_ridge_probe": embeddings_ridge_probe,
    # round-12 build: exact covariance (oracle) + PCA scores (rows-only)
    "embeddings_covariance": embeddings_covariance,
    "embeddings_correlation": embeddings_correlation,
    "embeddings_label_variances": embeddings_label_variances,
    # round-14 build: per-dim one-way ANOVA F across labels
    "embeddings_label_anova_f": embeddings_label_anova_f,
    # round-14 build: per-dim binned mutual information with labels
    "embeddings_label_mi": embeddings_label_mi,
    "embeddings_pca_scores": embeddings_pca_scores,
    "embeddings_lda_scores": embeddings_lda_scores,
    "embeddings_mahalanobis_outliers": embeddings_mahalanobis_outliers,
    # round-12 build: contrastive hard-negative mining, exact baseline
    "embeddings_hard_negatives": embeddings_hard_negatives,
    "embedding_knn_lsh": embedding_knn_lsh,
    "embedding_knn_ivf": embedding_knn_ivf,
    "embedding_knn_pq": embedding_knn_pq,
    "embedding_knn_pca": embedding_knn_pca,
    "embeddings_quantize_int8": embeddings_quantize_int8,
    "embeddings_semantic_dedup": embeddings_semantic_dedup,
    "embeddings_semantic_dedup_ivf": embeddings_semantic_dedup_ivf,
    "embeddings_label_centroid_confusion": embeddings_label_centroid_confusion,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "embeddings_dim_drift_psi": EMBEDDINGS_DIM_DRIFT_PSI_SQL,
    "embeddings_dim_drift_ttest": EMBEDDINGS_DIM_DRIFT_TTEST_SQL,
    "embeddings_dim_drift_ks": EMBEDDINGS_DIM_DRIFT_KS_SQL,
    "embeddings_covariance": EMBEDDINGS_COVARIANCE_SQL,
    "embeddings_correlation": EMBEDDINGS_CORRELATION_SQL,
    "embeddings_label_variances": EMBEDDINGS_LABEL_VARIANCES_SQL,
    "embeddings_label_anova_f": EMBEDDINGS_LABEL_ANOVA_F_SQL,
    "embeddings_label_mi": EMBEDDINGS_LABEL_MI_SQL,
    "embeddings_hard_negatives": EMBEDDINGS_HARD_NEGATIVES_SQL,
    "embeddings_quantize_int8": EMBEDDINGS_QUANTIZE_INT8_SQL,
    "embeddings_semantic_dedup": EMBEDDINGS_SEMANTIC_DEDUP_SQL,
    "embeddings_label_centroid_confusion":
        EMBEDDINGS_LABEL_CENTROID_CONFUSION_SQL,
}

ORACLE_SQL: dict[str, str] = {
    "embedding_dims_norms": EMBEDDING_DIMS_NORMS_SQL,
    "embedding_knn_bruteforce": EMBEDDING_KNN_BRUTEFORCE_SQL,
    "embeddings_cosine_pairs": EMBEDDINGS_COSINE_PAIRS_SQL,
}
