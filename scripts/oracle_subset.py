"""Oracle-check a SUBSET of declared/shelved queries — same canon as
scripts/driver_check.py, for fast per-change verification during the
optimization round.

    python scripts/oracle_subset.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

sys.path.insert(0, os.path.join(REPO, "scripts"))
from driver_check import TABLES, canon, load_entry  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args
    mod = load_entry()
    from realtime_data_pipeline_spark import queries as q
    from realtime_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="oracle-subset")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = mod.queries()
    oracle = mod.oracle_sql()
    bad = []
    for name in names:
        fn = queries.get(name) or q.SHELVED_QUERIES.get(name)
        sql = oracle.get(name) or q.SHELVED_ORACLE_SQL.get(name)
        if fn is None or sql is None:
            print(f"?? {name}: not found (fn={fn is not None})")
            bad.append(name)
            continue
        try:
            got = canon(fn(spark, sf_dir).toPandas())
            want = canon(con.execute(sql).df())
            if got == want:
                print(f"ok   {name}: {len(got[1])} rows hash-equal")
            else:
                bad.append(name)
                print(f"FAIL {name}: cols {got[0]} vs {want[0]}; "
                      f"{len(got[1])} vs {len(want[1])} rows")
                for g, w in list(zip(got[1], want[1]))[:5]:
                    if g != w:
                        print(f"  spark={g}\n  duck ={w}")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"ERR  {name}: {e}")
    print("ALL OK" if not bad else f"BAD: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
