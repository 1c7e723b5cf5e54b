"""Declared query inventory — the driver-checked operator surface.

Each submodule contributes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB ANSI SQL twin). This package
merges them into the single registry exported through ``__spark_entry__.py``.

Oracle-parity rules (learned the hard way; apply to every new query):
* alias every computed column identically in Spark and SQL;
* ``CAST(SUM(...) AS BIGINT)`` in DuckDB — its integer SUM is HUGEINT which
  pandas renders as float, breaking the hash;
* round double aggregates on BOTH sides (sum order is engine-dependent);
* dates → ``date_format(d, 'yyyy-MM-dd')`` / ``strftime(d, '%Y-%m-%d')``
  strings; raw DATE columns render differently across engines;
* DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday;
* Spark ``log`` is natural log = DuckDB ``ln``;
* no ``current_timestamp``/``rand``/approx in oracle-checked queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_data_pipeline_spark.queries import (
    analytics,
    asof,
    core,
    llm,
    relational,
    scalars,
    textdup,
    vectors,
    windows,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

for _mod in (
    core,
    relational,
    llm,
    analytics,
    vectors,
    textdup,
    windows,
    asof,
    scalars,
):
    QUERIES.update(_mod.QUERIES)
    ORACLE_SQL.update(_mod.ORACLE_SQL)

__all__ = ["QUERIES", "ORACLE_SQL"]
