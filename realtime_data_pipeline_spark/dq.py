"""Declarative data-quality engine.

Generalizes the reference's threshold-rule checker
(``spark_jobs/dq_checks.py:50-77``): four hardcoded predicates, each
evaluated with its own ``df.filter(pred).count()`` action — i.e. four full
table scans — plus a fifth scan for the cleaned write
(``spark_jobs/dq_checks.py:104-113``).

The rebuild keeps the semantics (predicate marks a *violation*; a rule fails
when its violation count exceeds a threshold; failing rules gate the pipeline
unless ``warn_only``) but evaluates **every rule in a single scan** via
conditional aggregation::

    df.agg(*[F.sum(F.when(rule.predicate, 1).otherwise(0)) for rule in rules])

which Catalyst compiles to one whole-stage-codegen pass with map-side partial
aggregation — the cost of one ``count()`` regardless of rule count. At 100 TB
this is the difference between 1 and N+1 full scans.

The clean/violation split (``spark_jobs/dq_checks.py:104-108``) becomes a
single disjunction filter, reusing the same predicate objects.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from functools import reduce
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One data-quality rule.

    ``predicate`` marks VIOLATING rows (mirroring the reference, where e.g.
    ``fare_amount < 0 OR fare_amount IS NULL`` at ``spark_jobs/dq_checks.py:50``
    counts bad rows). ``threshold`` is the max tolerated violation count
    (defaults mirror ``spark_jobs/dq_checks.py:15-18`` being per-rule ints).
    """

    name: str
    predicate: Column
    threshold: int = 0
    description: str = ""


@dataclass
class DQReport:
    """Machine-readable run summary, same shape as the reference's JSON
    artifact (``spark_jobs/dq_checks.py:81-97``)."""

    total_rows: int
    results: dict[str, dict] = field(default_factory=dict)
    passed: bool = True
    warn_only: bool = False
    run_at: str = ""

    def to_dict(self) -> dict:
        return {
            "run_at": self.run_at,
            "total_rows": self.total_rows,
            "passed": self.passed,
            "warn_only": self.warn_only,
            "rules": self.results,
        }

    def write_json(self, artifacts_dir: str | Path) -> Path:
        """Write the timestamped JSON artifact
        (parity with ``spark_jobs/dq_checks.py:98-99``)."""
        out_dir = Path(artifacts_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        path = out_dir / f"dq_summary_{stamp}.json"
        path.write_text(json.dumps(self.to_dict(), indent=2, default=str))
        return path


class DQCheckFailed(SystemExit):
    """Raised (exit code 2) when rules fail and ``warn_only`` is False —
    the reference's gate semantics (``spark_jobs/dq_checks.py:119-120``)."""

    def __init__(self, failed_rules: list[str]):
        self.failed_rules = failed_rules
        super().__init__(2)


def metrics_exprs(rules: list[Rule]) -> list[Column]:
    """The single-pass conditional aggregates (``total_rows`` + one
    violation count per rule) as reusable expressions — consumed by
    :func:`violation_counts_df` (standalone agg scan) and by
    ``DataFrame.observe`` in ``medallion.run_silver``, where the SAME
    metrics are collected as a side effect of the silver write's scan
    (zero dedicated actions)."""
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for rule in rules:
        aggs.append(
            F.sum(F.when(rule.predicate, F.lit(1)).otherwise(F.lit(0))).alias(rule.name)
        )
    return aggs


def violation_counts_df(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Single-pass conditional aggregation of all rule violation counts
    plus the total row count (operator A2 in SURVEY.md §2.4).

    Returns a one-row DataFrame with columns ``total_rows`` and one
    ``<rule.name>`` per rule. Replaces the reference's N ``count()`` scans
    (``spark_jobs/dq_checks.py:56-59``) with one aggregation.
    """
    return df.agg(*metrics_exprs(rules))


def evaluate(
    df: DataFrame,
    rules: list[Rule],
    warn_only: bool = False,
    raise_on_fail: bool = False,
) -> DQReport:
    """Evaluate all rules in one scan and apply the pass/warn/fail policy."""
    row = violation_counts_df(df, rules).collect()[0]
    return report_from_metrics(
        dict(row.asDict()), rules, warn_only=warn_only, raise_on_fail=raise_on_fail
    )


def report_from_metrics(
    metrics: dict,
    rules: list[Rule],
    warn_only: bool = False,
    raise_on_fail: bool = False,
) -> DQReport:
    """Build a :class:`DQReport` from an already-computed metrics mapping
    (``total_rows`` + one count per rule name) — the shared tail of
    :func:`evaluate` and the observed-write path, where the mapping is
    ``Observation.get`` collected during a sink's own scan."""
    report = DQReport(
        total_rows=int(metrics["total_rows"]),
        warn_only=warn_only,
        run_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    )
    failed: list[str] = []
    for rule in rules:
        violations = int(metrics[rule.name] or 0)
        ok = violations <= rule.threshold
        if not ok:
            failed.append(rule.name)
        report.results[rule.name] = {
            "violations": violations,
            "threshold": rule.threshold,
            "passed": ok,
            "description": rule.description,
        }
    report.passed = not failed
    if failed and not warn_only and raise_on_fail:
        raise DQCheckFailed(failed)
    return report


def any_violation(rules: list[Rule]) -> Column:
    """Disjunction of all rule predicates — True for rows violating ≥1 rule.

    Each predicate is NULL-coalesced to False so a NULL evaluation (e.g.
    ``l_quantity > 45`` with NULL l_quantity) counts as NON-violating —
    matching ``violation_counts_df`` (where ``F.when(NULL, 1).otherwise(0)``
    yields 0) and guaranteeing clean ∪ violations partitions the input.
    Without this, ``filter(bad)`` and ``filter(~bad)`` would BOTH drop
    NULL-predicate rows (three-valued logic)."""
    return reduce(
        lambda a, b: a | b,
        [F.coalesce(r.predicate, F.lit(False)) for r in rules],
    )


def split_clean_violations(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, violating_rows) via one filter each over the same plan —
    the quarantine split the reference does for silver
    (``spark_jobs/dq_checks.py:104-113``), minus its extra scan."""
    bad = any_violation(rules)
    return df.filter(~bad), df.filter(bad)


def lineitem_rules() -> list[Rule]:
    """DQ rules over the synthetic `lineitem` fixture, analog of the
    reference's taxi rules (``spark_jobs/dq_checks.py:50-53``):

    negative/null fare  -> negative/null l_extendedprice
    dropoff<pickup      -> l_discount outside [0,1] (col-sanity analog)
    trip_distance>200   -> l_quantity > 45 (long-tail outlier)
    bad passenger_count -> l_tax < 0 or null
    """
    return [
        Rule(
            "neg_or_null_price",
            (F.col("l_extendedprice") < 0) | F.col("l_extendedprice").isNull(),
            threshold=0,
            description="extendedprice must be non-null and >= 0",
        ),
        Rule(
            "bad_discount",
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
            threshold=0,
            description="discount must be within [0, 1]",
        ),
        Rule(
            "outlier_quantity",
            F.col("l_quantity") > 45,
            threshold=10_000,
            description="quantity long tail; warn-level threshold",
        ),
        Rule(
            "neg_or_null_tax",
            (F.col("l_tax") < 0) | F.col("l_tax").isNull(),
            threshold=0,
            description="tax must be non-null and >= 0",
        ),
    ]
