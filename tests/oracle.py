"""Local replica of the driver's DuckDB-oracle comparison so mismatches are
caught in-repo before a round runs (SURVEY.md §5 gate 1).

Compares: row count, column-name set, and values (columns sorted by name,
rows sorted by all columns) with exact match for non-floats and tight
tolerance for floats.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    out = df_pandas[cols]
    rows = [tuple(r) for r in out.itertuples(index=False, name=None)]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, float_tol: float = 1e-9):
    con = duckdb_conn(sf_dir)
    oracle_pd = con.execute(sql).df()
    spark_pd = spark_df.toPandas()

    s_cols, s_rows = _canon(spark_pd)
    o_cols, o_rows = _canon(oracle_pd)

    assert s_cols == o_cols, f"column mismatch: spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
        for c, (sv, ov) in enumerate(zip(sr, orr)):
            if isinstance(sv, float) and isinstance(ov, float):
                if math.isnan(sv) and math.isnan(ov):
                    continue
                assert math.isclose(sv, ov, rel_tol=float_tol, abs_tol=float_tol), (
                    f"row {i} col {s_cols[c]}: spark={sv!r} oracle={ov!r}"
                )
            else:
                assert str(sv) == str(ov), (
                    f"row {i} col {s_cols[c]}: spark={sv!r} oracle={ov!r}"
                )
