"""Driver replica — verifies __spark_entry__ exactly the way the external
driver does (see .claude/skills/verify/SKILL.md). Run from ANY cwd:

    python /root/repo/scripts/driver_check.py [sf_dir]

Exit 0 = all declared queries match their DuckDB oracle at sf0.01 (or the
given sf dir); nonzero = mismatch (details on stderr).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def canon(df_pandas):
    """Mirror the external driver's canonicalizer STRICTLY: it sorts the
    pandas frame with ``sort_values`` (which factorizes object columns and
    raises on unhashable values like lists/ndarrays), then hashes rows. A
    lenient stringify here once passed a query the real driver failed
    (round 2, array<float> column) — so reject unhashable cell types up
    front and sort the same way the driver does."""
    cols = sorted(df_pandas.columns)
    out = df_pandas[cols]
    for c in cols:
        bad = out[c].map(lambda v: isinstance(v, (list, tuple, dict, set))
                         or type(v).__name__ == "ndarray").any()
        if bad:
            raise TypeError(
                f"column {c!r} holds list/array values — the driver's "
                "canonicalizer cannot hash these; project to scalars"
            )
    if len(out):
        out = out.sort_values(by=cols)  # same call the driver makes
    rows = [tuple(str(x) for x in r) for r in out.itertuples(index=False, name=None)]
    return cols, sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mod = load_entry()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("driver-check")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n = mod.entry(spark).count()
    print(f"entry(): {n} rows", file=sys.stderr)
    assert n >= 0

    queries = mod.queries()
    oracle = mod.oracle_sql()
    bad: list[str] = []
    # The external driver records CORRECTNESS rows in REGISTRY INSERTION
    # ORDER and stops at 50 (round 2 silently dropped the tail) — iterate
    # the same way and flag overflow instead of hiding it.
    names = list(queries)
    if len(names) > 50:
        bad.append("__registry_overflow__")
        print(
            f"FAIL registry: {len(names)} declared queries; the driver "
            f"checks only the first 50 — these get NO row: {names[50:]}",
            file=sys.stderr,
        )
    for name in names:
        fn = queries[name]
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL {name}: query raised {exc}", file=sys.stderr)
            continue
        if name not in oracle:
            # the real driver canonicalizes rows-only queries too (to count/
            # hash rows) — run the same strict canon so unhashable output
            # columns fail HERE, not in the external run
            try:
                canon(spark_pd)
            except Exception as exc:  # noqa: BLE001
                bad.append(name)
                print(f"FAIL {name}: rows-only canon raised {exc}", file=sys.stderr)
                continue
            print(f"ok   {name}: rows-only ({len(spark_pd)} rows)", file=sys.stderr)
            continue
        try:
            oracle_pd = con.execute(oracle[name]).df()
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL {name}: oracle raised {exc}", file=sys.stderr)
            continue
        s_cols, s_rows = canon(spark_pd)
        o_cols, o_rows = canon(oracle_pd)
        if s_cols != o_cols:
            bad.append(name)
            print(f"FAIL {name}: cols spark={s_cols} oracle={o_cols}", file=sys.stderr)
        elif s_rows != o_rows:
            bad.append(name)
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
            ) if len(s_rows) == len(o_rows) else ("rowcount", len(s_rows), len(o_rows))
            print(f"FAIL {name}: first diff {diff}", file=sys.stderr)
        else:
            print(f"ok   {name}: {len(s_rows)} rows hash-equal", file=sys.stderr)

    spark.stop()
    if bad:
        print(f"FAILED: {bad}", file=sys.stderr)
        return 1
    print(f"ALL OK: {len(queries)} queries", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
