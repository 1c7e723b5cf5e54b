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


@pytest.mark.slow
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
@pytest.mark.slow
def test_rows_only_query_runs(spark, sf_dir, name):
    fn = q.QUERIES.get(name) or q.SHELVED_QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_zscore_degenerate_groups_yield_no_anomalies(spark, tmp_path):
    """A singleton group (var = 0/0 = NaN) and an all-equal group
    (var = 0) must contribute ZERO anomaly rows — both engines order NaN
    above every number, so an unguarded abs(z) > threshold would flag
    the entire degenerate group and the oracle could never disagree."""
    import duckdb

    from realtime_data_pipeline_spark.queries import mlfeat

    p = str(tmp_path / "orders.parquet")
    spark.createDataFrame(
        [
            (1, "1-URGENT", 100.0),   # singleton group
            (2, "2-HIGH", 50.0),      # all-equal group
            (3, "2-HIGH", 50.0),
            (4, "3-MEDIUM", 10.0),    # normal group, no outliers
            (5, "3-MEDIUM", 11.0),
            (6, "3-MEDIUM", 12.0),
        ],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).coalesce(1).write.parquet(p)
    got = mlfeat.orders_price_anomalies_zscore(spark, str(tmp_path)).collect()
    assert got == []
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    assert con.execute(mlfeat.ORDERS_PRICE_ANOMALIES_ZSCORE_SQL).fetchall() == []
