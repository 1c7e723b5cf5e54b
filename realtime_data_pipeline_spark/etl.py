"""Bronze/silver transform library (P1–P6) — the reference's per-column
``withColumn`` loops re-expressed as SINGLE-projection transforms.

The reference builds its plans one column at a time
(rename loop ``spark_jobs/batch_etl.py:42-43``, trim loop
``spark_jobs/write_silver.py:26-28``) which grows a deep Catalyst plan —
the SURVEY §4 anti-pattern. Every transform here emits exactly one
``select``/``toDF`` node regardless of column count, so analysis cost is
O(1) in pipeline depth and the whole bronze chain fuses into one
whole-stage-codegen projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_columns(df: DataFrame) -> DataFrame:
    """P1: ``strip().lower().replace(' ', '_')`` every column name in one
    ``toDF`` (parity: ``spark_jobs/batch_etl.py:42-43``)."""
    return df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])


def project_existing(df: DataFrame, wanted: list[str]) -> DataFrame:
    """P2: keep the wanted columns that exist, preserving ``wanted`` order
    (parity: ``spark_jobs/batch_etl.py:57-62``)."""
    present = set(df.columns)
    keep = [c for c in wanted if c in present]
    return df.select(*keep)


def with_derived_date(
    df: DataFrame, ts_col: str, out_col: str = "pickup_date"
) -> DataFrame:
    """P3: derive a DATE partition column from a timestamp column; raise if
    the source column is missing (parity: ``spark_jobs/batch_etl.py:46-54``,
    including its explicit-failure branch)."""
    if ts_col not in df.columns:
        raise ValueError(
            f"timestamp column {ts_col!r} not found; have {df.columns}"
        )
    return df.withColumn(out_col, F.to_date(F.col(ts_col)))


def trim_strings(df: DataFrame) -> DataFrame:
    """P4: trim every string column — ONE select over ``df.dtypes``, not a
    per-column loop (parity: ``spark_jobs/write_silver.py:26-28``)."""
    exprs = [
        F.trim(F.col(c)).alias(c) if t == "string" else F.col(c)
        for c, t in df.dtypes
    ]
    return df.select(*exprs)


def drop_temp_columns(df: DataFrame, prefix: str = "_") -> DataFrame:
    """P5: drop scratch columns by prefix
    (parity: ``spark_jobs/write_silver.py:31-33``)."""
    temps = [c for c in df.columns if c.startswith(prefix)]
    return df.drop(*temps) if temps else df


def with_audit_timestamp(
    df: DataFrame, col: str = "silver_loaded_at"
) -> DataFrame:
    """P6: load-audit timestamp (parity: ``spark_jobs/write_silver.py:36``).
    Nondeterministic by design — never include in oracle-checked output."""
    return df.withColumn(col, F.current_timestamp())


def bronze_transform(
    df: DataFrame,
    ts_col: str,
    keep_cols: list[str],
    date_col: str = "event_date",
) -> DataFrame:
    """The bronze boundary: normalize names → derive partition date →
    project. Equivalent of ``spark_jobs/batch_etl.py:38-62`` as one chain;
    ``keep_cols`` are post-normalization names and the derived date is
    always kept (it is the partition key)."""
    out = normalize_columns(df)
    out = with_derived_date(out, ts_col, date_col)
    # dict.fromkeys dedups while preserving order: keep_cols may already
    # name date_col, and a doubled column breaks the partitioned write
    return project_existing(out, list(dict.fromkeys([*keep_cols, date_col])))


def silver_transform(df: DataFrame, audit_col: str = "silver_loaded_at") -> DataFrame:
    """The silver boundary: trim strings → drop scratch cols → audit stamp
    (equivalent of ``spark_jobs/write_silver.py:26-36``)."""
    return with_audit_timestamp(drop_temp_columns(trim_strings(df)), audit_col)
