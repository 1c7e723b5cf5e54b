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
    curation,
    llm,
    mlfeat,
    relational,
    scalars,
    subqueries,
    textdup,
    timeseries,
    tpch,
    vectors,
    windows,
)

_MERGED: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
# Implemented queries deliberately NOT declared to the external driver (it
# records at most 50 rows); still smoke-run by tests/test_queries_oracle.py.
SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
# Oracle twins for shelved queries — excluded from the driver-facing
# ORACLE_SQL (its keys must be a subset of queries()), but still
# hash-checked locally by tests/test_queries_oracle.py.
SHELVED_ORACLE_SQL: dict[str, str] = {}

for _mod in (
    core,
    relational,
    llm,
    curation,
    analytics,
    windows,
    asof,
    scalars,
    subqueries,
    tpch,
    mlfeat,
    timeseries,
    vectors,
    textdup,
):
    _MERGED.update(_mod.QUERIES)
    ORACLE_SQL.update(_mod.ORACLE_SQL)
    SHELVED_QUERIES.update(getattr(_mod, "SHELVED_QUERIES", {}))
    SHELVED_ORACLE_SQL.update(getattr(_mod, "SHELVED_ORACLE_SQL", {}))

# The external driver checks queries in registry insertion order and caps at
# 50 rows (round-2 lesson: the tail got no CORRECTNESS verdict). Order
# oracle-backed queries first so every exact-checkable operator is guaranteed
# a driver row; rows-only queries (no SQL twin by nature) take the remaining
# slots. The declared total is kept at <= 50 — overflow would silently lose
# driver coverage, so tests/test_entry.py asserts the budget.
DRIVER_ROW_BUDGET = 50

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **{k: v for k, v in _MERGED.items() if k in ORACLE_SQL},
    **{k: v for k, v in _MERGED.items() if k not in ORACLE_SQL},
}

__all__ = [
    "DRIVER_ROW_BUDGET",
    "ORACLE_SQL",
    "QUERIES",
    "SHELVED_ORACLE_SQL",
    "SHELVED_QUERIES",
]
