"""Similarity-search operators over embedding columns (X3).

Cosine math is built from JVM higher-order array functions
(``zip_with``/``aggregate``) with element-wise double casts — index-ordered
summation, so DuckDB's ``list_cosine_similarity`` over ``DOUBLE[]`` agrees
to ~1e-15 and round-6 comparisons are engine-stable.

Brute force is the correctness baseline: broadcast the (small) query set,
stream the candidate corpus through map tasks — no shuffle of the corpus at
all; cost is O(|corpus|·|queries|·dim) FLOPs in one pass. That is the right
plan up to a few thousand queries; beyond that, switch to the LSH-bucketed
path in ``lsh.py`` which replaces the broadcast-product with a shuffle on
band keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.ops import topk_per_group


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Index-ordered double dot product — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small enough to broadcast (the driver of the
    product); the corpus is never shuffled — Spark plans
    BroadcastNestedLoopJoin and the per-task loop is the scan itself.
    Self-matches (same id) are excluded. Ranking orders by cosine rounded
    to 6 decimals with the candidate id as tiebreaker, making the result
    set deterministic and engine-portable.
    """
    cand = corpus.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("__vec")
    )
    q = queries.select(
        F.col(query_id_col), as_double_array(F.col(query_vec_col)).alias("__qvec")
    )
    pairs = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qvec"), F.col("__vec")), 6).alias("sim6"),
        )
    )
    top = topk_per_group(
        pairs,
        [query_id_col],
        [F.col("sim6").desc(), F.col(id_col).asc()],
        k=k,
    )
    return top.select(
        query_id_col,
        id_col,
        F.round(F.col("sim6"), 4).alias("sim"),
        F.col("rn").cast("int").alias("rank"),
    )
