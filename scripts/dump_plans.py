"""Dump .explain("formatted") for declared queries (and selected
shelved bench legs) to plans/<tag>/<query>_<suffix>.txt — the
optimization round's before/after plan evidence.

Usage:
    python scripts/dump_plans.py <tag> <suffix> [name ...]

With no names: all declared queries + the shelved HEADLINE legs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from realtime_data_pipeline_spark import queries as q  # noqa: E402
from realtime_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    if not names:
        names = sorted(q.QUERIES)

    spark = get_spark(app_name="rdp-plan-dump")
    for name in names:
        fn = q.QUERIES.get(name) or q.SHELVED_QUERIES.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"!! {name}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
