"""DuckDB baseline for the bench headline queries — the numeric anchor for
BENCH_r{N} (BASELINE.md carries the recorded numbers; re-run this to
refresh them on new hardware):

    python /root/repo/scripts/baseline_duckdb.py [sf_dir]

For every bench headline query that has a DuckDB oracle twin, runs the
oracle SQL at the bench scale factor (default sf0.1) on the same machine
and prints one JSON line {"queries": {name: sec}, "total": sec}. Each
query is run once warm (after a cold pass) — mirroring bench.py's
warm-then-measure discipline. Queries with no SQL twin (MinHash LSH,
streaming) have no DuckDB equivalent and are skipped.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from bench import HEADLINE
    from realtime_data_pipeline_spark import queries as q

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # rotation moves queries between the declared and shelved tiers;
        # the anchor follows the query wherever its twin lives
        sql = q.ORACLE_SQL.get(name) or q.SHELVED_ORACLE_SQL.get(name)
        if sql is None:
            print(f"# {name}: no SQL twin, skipped", file=sys.stderr)
            continue
        con.execute(sql).fetchall()  # warm (page cache, JIT-ish prep)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "engine": f"duckdb {duckdb.__version__}",
                "sf_dir": sf_dir,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
