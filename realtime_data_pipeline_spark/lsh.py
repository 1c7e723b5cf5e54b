"""Random-hyperplane (SimHash) LSH for cosine similarity at scale (X3/X2).

The 100 TB shape: instead of an all-pairs product, each vector gets an
``n_planes``-bit signature (sign of the dot product against fixed random
hyperplanes), the signature is cut into ``n_bands`` bands, and vectors
colliding in ANY band become candidate pairs via an equi-join on
``(band_id, band_key)`` — a plain shuffle join Catalyst/AQE can optimize,
with candidate volume tuned by (bands, rows-per-band) instead of |corpus|².
Exact cosine re-ranks candidates, so precision is exact; only recall is
approximate (P[collide in ≥1 band] = 1-(1-p^r)^b, p = 1-θ/π).

Signatures are computed with an Arrow-batched pandas UDF doing ONE numpy
matmul per batch — the documented escape hatch for dense vector math, where
a JVM higher-order-function expression tree (n_planes × dim element hops
per row) interprets scalar-at-a-time and loses by ~10×. Hyperplanes are
seeded literals, so signatures are deterministic across runs/engines.

WHEN TO USE WHICH (measured, LSH_RECALL.json): hyperplane banding holds
recall only in the HIGH-similarity regime — (32 planes, 8 bands) keeps
1.0 recall at cos >= 0.9 — and degrades exactly where loose-similarity
work lives: at τ≈0.35 on 64-dim vectors the sweep shows 0.21-0.93 recall
at only 1.6-27× pruning (P[band collision] flattens as θ→π/2, so bands
must get so short that everything collides). The DEFAULT scale path for
τ < ~0.5 — ANN search and semantic dedup alike — is the trained-IVF
coarse quantizer (``similarity.train_centroids_kmeans`` +
``similarity.build_ivf_index`` / ``semantic_dedup(centroids=...)``):
data-adaptive cells hold recall with real pruning at matched cell budget
(``LSH_RECALL.json#semdedup_quantizer_recall``). Keep hyperplane LSH for
near-duplicate regimes (cos >= ~0.8) where its zero-training determinism
is the win.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from realtime_data_pipeline_spark import ops


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def signature_udf(planes: np.ndarray):
    """Returns a pandas UDF mapping array<float> -> array<int> of sign bits.
    One (batch × dim) @ (dim × n_planes) matmul per Arrow batch."""
    planes_t = planes.T.copy()

    @pandas_udf("array<int>")
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes_t >= 0).astype(np.int32)  # (batch, n_planes)
        return pd.Series(list(bits))

    return _sig


def band_table(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: np.ndarray,
    n_bands: int,
) -> DataFrame:
    """(id, band_id, band_key) — one row per band per vector. ``band_key``
    packs the band's sign bits into a string; joins on (band_id, band_key)
    are equi-joins on short keys."""
    n_planes = planes.shape[0]
    r = n_planes // n_bands
    sig = ops.spread(df, id_col).select(
        F.col(id_col), signature_udf(planes)(F.col(vec_col)).alias("__sig")
    )
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "", F.slice(F.col("__sig"), b * r + 1, r)
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("__band"),
    )
    return bands.select(id_col, "__band.band_id", "__band.band_key")


def lsh_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    planes: np.ndarray,
    n_bands: int,
    left_id: str = "query_id",
    left_vec: str = "query_vec",
    right_id: str = "vec_id",
    right_vec: str = "embedding",
) -> DataFrame:
    """Distinct (left_id, right_id) pairs colliding in ≥1 band. The dedup is
    the one extra shuffle LSH costs over a plain join — it shrinks the
    re-rank input, which dominates at scale."""
    lb = band_table(left, left_id, left_vec, planes, n_bands)
    rb = band_table(right, right_id, right_vec, planes, n_bands)
    return (
        lb.join(rb, ["band_id", "band_key"])
        .select(left_id, right_id)
        .distinct()
    )
