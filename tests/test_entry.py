"""Import-smoke gate for the driver surface.

Round 1 was zeroed by an ImportError in the queries package that no test
caught (VERDICT.md round 1, blocker 1). This test makes that class of
failure impossible to ship: it imports the driver entry module exactly the
way the driver does and asserts the registry contract.
"""

from __future__ import annotations

import importlib
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_module_imports():
    sys.path.insert(0, REPO_ROOT)
    mod = importlib.import_module("__spark_entry__")
    assert callable(mod.entry)
    assert callable(mod.queries)
    assert callable(mod.oracle_sql)


def test_registry_contract():
    sys.path.insert(0, REPO_ROOT)
    mod = importlib.import_module("__spark_entry__")
    queries = mod.queries()
    oracle = mod.oracle_sql()
    assert len(queries) > 0
    # every oracle entry must have a runnable query; rows-only queries may
    # omit the oracle, never the reverse
    assert set(oracle) <= set(queries), sorted(set(oracle) - set(queries))
    for name, fn in queries.items():
        assert callable(fn), name
    for name, sql in oracle.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_entry_runs_flagship(spark):
    sys.path.insert(0, REPO_ROOT)
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
