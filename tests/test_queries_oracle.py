"""Every declared query in the registry must match its DuckDB oracle —
the same comparison the driver runs at sf0.01 (here at the test SF)."""

from __future__ import annotations

import pytest

from realtime_data_pipeline_spark import queries as q
from tests.oracle import assert_matches_oracle

ORACLE_KEYS = sorted(q.ORACLE_SQL)


def test_registry_consistency():
    assert set(q.ORACLE_SQL) <= set(q.QUERIES), (
        "every oracle entry needs a queries() entry"
    )
    assert set(q.SHELVED_ORACLE_SQL) <= set(q.SHELVED_QUERIES), (
        "every shelved oracle needs a shelved query"
    )
    assert not (set(q.QUERIES) & set(q.SHELVED_QUERIES)), (
        "a query must be declared OR shelved, not both"
    )


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    df = q.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, q.ORACLE_SQL[name], sf_dir)


@pytest.mark.parametrize("name", sorted(q.SHELVED_ORACLE_SQL))
def test_shelved_query_matches_oracle(spark, sf_dir, name):
    """Shelved queries lost their driver slot, not their correctness bar."""
    df = q.SHELVED_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, q.SHELVED_ORACLE_SQL[name], sf_dir)


@pytest.mark.parametrize(
    "name",
    sorted(
        (set(q.QUERIES) - set(q.ORACLE_SQL))
        | (set(q.SHELVED_QUERIES) - set(q.SHELVED_ORACLE_SQL))
    ),
)
def test_rows_only_query_runs(spark, sf_dir, name):
    fn = q.QUERIES.get(name) or q.SHELVED_QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
