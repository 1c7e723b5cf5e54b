"""Deduplication operators for large-scale training-data pipelines (X1/X2).

Exact dedup and keep-latest are pure DataFrame compositions (one shuffle on
the key set). Near-dup (MinHash / SimHash / n-gram Jaccard) lives in
``neardup.py``; this module is the exact family.

Scale notes:
* ``exact_dedup`` shuffles once on the full key tuple — at 100 TB prefer
  hashing wide key tuples down to one column first (``fingerprint_dedup``)
  so the shuffle payload is 8-16 bytes/row, not the whole row;
* ``keep_latest`` is a single ``row_number`` window — one shuffle on the
  entity key; skew in a hot key is bounded by that key's own row count and
  AQE skew-split handles the join-side cousins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """X1: exact deduplication. ``keys=None`` dedups whole rows.

    ``dropDuplicates`` keeps an ARBITRARY row per key (first seen per
    partition) — fine for true duplicates, wrong for entity resolution;
    use :func:`keep_latest` when rows differ outside the key columns.
    """
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()


def keep_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """X1: deterministic one-row-per-key dedup — keep the first row per key
    under ``order_by`` (pass ``ts.desc()`` + a unique tiebreaker for
    keep-latest semantics). One shuffle on ``keys``.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_fingerprint(col: Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 hex) for exact content
    dedup — hash, then dedup on the 32-char digest instead of shuffling the
    full document text. Cross-engine stable (DuckDB ``md5`` matches)."""
    return F.md5(col.cast("string"))


def fingerprint_dedup(
    df: DataFrame, content_col: str, tiebreak: list[Column]
) -> DataFrame:
    """X1 at scale: dedup documents by content hash. The shuffle moves the
    32-byte digest + row, grouped on the digest; ``tiebreak`` makes the
    survivor deterministic (e.g. lowest doc_id)."""
    return keep_latest(
        df.withColumn("__fp", content_fingerprint(F.col(content_col))),
        ["__fp"],
        tiebreak,
    ).drop("__fp")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 12,
) -> DataFrame:
    """Label-propagation connected components over a near-dup pair graph:
    each node's label converges to the MINIMUM id reachable from it, so a
    component is named by its smallest member. The principled grouping
    behind dedup — ``drop_neardups`` is the one-shot greedy approximation;
    this is the iterative exact version.

    Each round is one join + one min-aggregate (both equi-shuffles on the
    id); labels decrease monotonically, so convergence = "no label changed
    this round", detected with an old-vs-new equi-join on ``id`` — both
    sides come out of a groupBy/persist hash-partitioned on ``id``, so the
    diff adds no exchange, and ``isEmpty()`` stops at the first changed row.
    (A label-SUM fixpoint would be one scalar cheaper but silently declares
    convergence after one round for non-numeric ids, where SUM is NULL —
    round-3 advisory.) Rounds needed = graph diameter (near-dup components
    are shallow; ``max_iter`` bounds adversarial chains). Each round's
    result is persisted and the previous round released — the loop holds
    one label table, not ``max_iter`` lineages (at 100 TB you would also
    checkpoint every few rounds to cut lineage depth).

    Returns (id, component).
    """
    fwd = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        edges.select("a")
        .distinct()
        .select(F.col("a").alias("id"), F.col("a").alias("label"))
        .persist()
    )
    converged = False
    for _ in range(max_iter):
        nbr = edges.join(
            labels.select(F.col("id").alias("b"), F.col("label")), "b"
        ).select(F.col("a").alias("id"), "label")
        new_labels = (
            labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))
        ).persist()
        changed = not (
            new_labels.join(
                labels.select("id", F.col("label").alias("__old")), "id"
            )
            .filter(F.col("label") != F.col("__old"))
            .isEmpty()
        )
        labels.unpersist()
        labels = new_labels
        if not changed:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # returning part-propagated labels would silently split true
        # components — fail loudly instead and let the caller raise the
        # bound (diameter > max_iter means a pathological chain graph)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (component diameter exceeds it)"
        )
    return labels.select("id", F.col("label").alias("component"))


def drop_neardups(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """X2 end-to-end: given near-dup ``pairs`` (id_a < id_b), keep the
    lowest-id member of every dup relation by anti-joining away each id
    that appears as the GREATER side of a pair.

    This greedy rule is a single anti join (one shuffle on the id) and
    removes every detected duplicate; it can over-drop relative to full
    connected-components clustering (b dropped for a, c dropped for b even
    if a–c were never compared), which is the standard trade at corpus
    scale — CC needs an iterative join loop."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
