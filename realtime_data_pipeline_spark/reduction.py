"""Dimensionality reduction over embedding columns (X3 support).

The missing step between "raw 64-d embeddings" and "cheap ANN at 100 TB":
project to a smaller space first, then search. Three operators share one
projection core:

* **PCA** — exact, from a ONE-PASS mergeable moments aggregate: each
  partition emits a single ``(n, Σx, Σxxᵀ)`` partial (geometry-bounded:
  ``1 + d + d²`` doubles per partition, independent of row count), the
  partials merge distributively (posexplode → groupBy position → sum),
  and only the merged ``1 + d + d²`` totals ever reach the driver — the
  same bounded-collect contract as IVF centroids / PQ codebooks. The
  d×d eigendecomposition is driver-side numpy (d ≤ a few thousand by
  declaration; the INPUT is never collected).
* **Whitening** — the same model with components scaled by ``λ^-1/2``,
  so the projected covariance is the identity (the normalization
  SemDeDup-style pipelines apply before cosine thresholds).
* **Johnson-Lindenstrauss random projection** — data-independent seeded
  Gaussian matrix; no training pass at all, distance-preserving in
  expectation. The zero-cost fallback when even one moments pass over
  the corpus is too expensive or the stream never ends.

Projection itself is map-only — no shuffle, no state. Two spellings:
``method="expr"`` builds JVM column expressions (zip_with/aggregate dot
products against literal component rows — whole-stage codegen,
engine-auditable, the right call for d·k up to a few thousand) and
``method="arrow"`` does one numpy matmul per Arrow batch inside
``mapInPandas`` (BLAS; the hot path once d·k grows past what a literal
plan should carry). Both produce the same numbers to float64 matmul
reassociation (~1e-12); parity is pytest-pinned.

At 100 TB: the moments pass is one full scan with ≤ (#partitions) rows
shuffled; projection is embarrassingly parallel; nothing here grows with
corpus size except the single scan. PCA→ANN recall is measured (see
``tests/test_reduction.py`` and the ``LSH_RECALL.json`` family) — the
reduced space is a candidate generator, with the existing exact-refine
machinery available on top.

Reference parity note: the reference repo has no reduction surface at
all (its functional core is 7 single-table ETL scripts); this module is
part of the declared LLM-training-data extension surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.similarity import as_double_array


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).filter(
        F.col("d") > 0
    ).first()
    if row is None:
        raise ValueError(f"cannot infer dim: no non-empty {vec_col!r} rows")
    return int(row["d"])


def moments(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[int, np.ndarray, np.ndarray]:
    """One-pass exact (n, mean, covariance) of a vector column.

    Rows whose vector is NULL or not exactly ``dim`` long are excluded
    (ragged corpora coarsen to the declared geometry instead of erroring
    — same stance as ``orthant_bucket``). Returns ``(n, mean[d],
    cov[d,d])`` with the unbiased (n-1) covariance; requires n ≥ 2.

    Scale shape: one scan; each partition emits ONE partial row of
    ``1 + d + d²`` doubles; partials merge by position with a groupBy
    sum (≤ partitions × (1+d+d²) rows shuffled); the driver sees exactly
    ``1 + d + d²`` totals — never the data.
    """
    d = dim if dim is not None else _infer_dim(df, vec_col)

    def partials(batches):
        n = 0
        s = np.zeros(d, dtype=np.float64)
        ss = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            for v in pdf["v"]:
                if v is None or len(v) != d:
                    continue
                x = np.asarray(v, dtype=np.float64)
                n += 1
                s += x
                ss += np.outer(x, x)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    part = df.select(as_double_array(F.col(vec_col)).alias("v")).mapInPandas(
        partials, schema="n long, s array<double>, ss array<double>"
    )
    # distributive merge: position-keyed sums; slot 0 is n, 1..d the sums,
    # the rest the flattened outer-product sums
    merged = (
        part.select(
            F.posexplode(
                F.concat(
                    F.array(F.col("n").cast("double")), F.col("s"), F.col("ss")
                )
            ).alias("pos", "val")
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()  # bounded: exactly 1 + d + d*d rows, data-size-free
    )
    tot = np.zeros(1 + d + d * d, dtype=np.float64)
    for r in merged:
        tot[r["pos"]] = r["val"]
    n = int(tot[0])
    if n < 2:
        raise ValueError(f"moments needs >= 2 valid vectors, got {n}")
    s = tot[1 : 1 + d]
    ss = tot[1 + d :].reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, cov


def pca_train(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> dict:
    """Exact PCA model from :func:`moments`: top-``k`` eigenvectors of the
    covariance, eigenvalue-descending, with a deterministic sign
    convention (the largest-|·| coordinate of each component is made
    positive) so retrains are bit-reproducible when eigenvalues are
    simple. Returns ``{"mean", "components" (k×d), "eigvals" (k),
    "explained" (fraction of total variance), "n"}``.
    """
    n, mean, cov = moments(df, vec_col=vec_col, dim=dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    eigvals = vals[order]
    comps = vecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(vals.sum())
    return {
        "mean": mean,
        "components": comps,
        "eigvals": eigvals,
        "explained": float(eigvals.sum() / total) if total > 0 else 1.0,
        "n": n,
    }


def _lit_vec(v: np.ndarray) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def project(
    df: DataFrame,
    matrix: np.ndarray,
    mean: np.ndarray | None = None,
    vec_col: str = "embedding",
    out_col: str = "proj",
    method: str = "expr",
) -> DataFrame:
    """Map-only linear projection ``y = M (x - μ)`` appended as
    ``out_col`` (array<double>, len = M rows). ``method="expr"`` keeps
    the whole computation in JVM codegen (literal component rows,
    index-ordered dots — engine-exact and plan-auditable);
    ``method="arrow"`` does one BLAS matmul per Arrow batch for large
    d·k. Rows with NULL / wrong-length vectors get a NULL projection
    ("expr") or are passed through with NULL ("arrow") — never dropped,
    the caller owns filtering.
    """
    mat = np.asarray(matrix, dtype=np.float64)
    k, d = mat.shape
    mu = (
        np.zeros(d, dtype=np.float64)
        if mean is None
        else np.asarray(mean, dtype=np.float64)
    )
    if method == "expr":
        v = as_double_array(F.col(vec_col))
        centered = F.zip_with(v, _lit_vec(mu), lambda x, m: x - m)
        comps = [_dot_expr(centered, _lit_vec(mat[i])) for i in range(k)]
        out = F.when(F.size(F.col(vec_col)) == d, F.array(*comps))
        return df.withColumn(out_col, out)
    if method != "arrow":
        raise ValueError(f"method must be expr|arrow, got {method!r}")

    cols = df.columns
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` array<double>"]
    )

    def batches(it):
        for pdf in it:
            vs = pdf[vec_col]
            ok = np.flatnonzero(
                vs.map(lambda v: v is not None and len(v) == d).to_numpy()
            )
            res: list = [None] * len(pdf)
            if len(ok):
                X = np.stack(
                    [np.asarray(vs.iat[i], dtype=np.float64) for i in ok]
                )
                Y = (X - mu) @ mat.T
                for p, row in zip(ok, Y):
                    res[p] = list(row)
            out = pdf[cols].copy()
            out[out_col] = res
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    method: str = "expr",
) -> DataFrame:
    """Project onto a :func:`pca_train` model. ``whiten=True`` scales each
    component by ``λ^-1/2`` so the projected covariance is I_k (PCA
    whitening) — zero-variance components are left unscaled rather than
    dividing by ~0."""
    comps = model["components"]
    if whiten:
        lam = np.asarray(model["eigvals"], dtype=np.float64)
        scale = np.where(lam > 1e-12, 1.0 / np.sqrt(np.maximum(lam, 1e-12)), 1.0)
        comps = comps * scale[:, None]
    return project(
        df, comps, mean=model["mean"], vec_col=vec_col, out_col=out_col,
        method=method,
    )


def jl_matrix(out_dim: int, in_dim: int, seed: int = 7) -> np.ndarray:
    """Seeded Gaussian Johnson-Lindenstrauss matrix, rows scaled by
    ``1/√out_dim`` so squared L2 distances are preserved in expectation.
    Deterministic across machines (RandomState's MT19937 stream is
    pinned by numpy's compatibility guarantee)."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "rp",
    seed: int = 7,
    dim: int | None = None,
    method: str = "expr",
) -> DataFrame:
    """Data-independent JL projection — no training scan; the matrix is
    derived from the seed alone, so a stream can project from its first
    row and historical projections never go stale."""
    d = dim if dim is not None else _infer_dim(df, vec_col)
    return project(
        df, jl_matrix(out_dim, d, seed=seed), mean=None, vec_col=vec_col,
        out_col=out_col, method=method,
    )


def covariance_rows(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[int, list[tuple[int, int, float]]]:
    """The covariance matrix as (i, j, cov) rows — the oracle-facing
    reshape of :func:`moments` (DuckDB checks it with COVAR_SAMP over an
    unnested self-join; this side never materializes the quadratic
    pairing, only the one-pass partials)."""
    n, _mean, cov = moments(df, vec_col=vec_col, dim=dim)
    d = cov.shape[0]
    return n, [
        (i, j, round(float(cov[i, j]), 6)) for i in range(d) for j in range(d)
    ]
