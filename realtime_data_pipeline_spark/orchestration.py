"""Pipeline orchestration (parity: ``dags/etl_daily.py``).

The reference schedules fetch ≫ batch ≫ dq as three Airflow
``BashOperator`` subprocesses (``dags/etl_daily.py:20-35``, daily 03:00
cron at ``:14``). Here every stage is a library callable, so the same
graph runs under any scheduler — the optional Airflow DAG below shells
into the SAME entry points (one Spark session per task process, matching
the reference's process-per-stage isolation).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import SparkSession

from realtime_data_pipeline_spark import dq, medallion, sources


class _Tee(io.TextIOBase):
    """Write-through to several sinks — stage output lands in the log file
    AND still reaches the console, like the reference runner's echo+log."""

    def __init__(self, *sinks):
        self._sinks = sinks

    def write(self, s: str) -> int:  # pragma: no cover - trivial
        for k in self._sinks:
            k.write(s)
        return len(s)

    def flush(self) -> None:  # pragma: no cover - trivial
        for k in self._sinks:
            k.flush()


def run_staged(
    stages: list[tuple[str, Callable[[], Any]]],
    log_dir: str,
) -> dict:
    """Run pipeline stages in order with per-stage log capture — parity
    with the reference orchestrator, which spawns each step as a child
    process and tees its stdout/stderr into timestamped log files,
    aborting on a nonzero exit (``run_full_pipeline.ps1:112-124,144-145``).

    Stages here are library callables in ONE Spark session (the engine
    posture), so "child output" = driver-side Python stdout/stderr during
    the stage; JVM executor logs keep flowing to Spark's own log4j sinks.
    Exit-code parity: 0 ok, 2 DQ gate failure (``dq_checks.py:119-120``),
    1 any other error. The first failing stage stops the run; a manifest
    JSON (stage -> log file, exit code, duration) is written beside the
    logs so a scheduler can post-mortem a run from artifacts alone.

    Returns ``{"stages": {...}, "outputs": {...}, "manifest": path}``.
    """
    os.makedirs(log_dir, exist_ok=True)
    run_ts = time.strftime("%Y%m%d_%H%M%S")
    results: dict[str, dict] = {}
    outputs: dict[str, Any] = {}
    failure: BaseException | None = None
    for name, fn in stages:
        log_path = os.path.join(log_dir, f"{run_ts}_{name}.log")
        buf = io.StringIO()
        status, exit_code, err = "ok", 0, None
        t0 = time.monotonic()
        try:
            with (
                contextlib.redirect_stdout(_Tee(sys.stdout, buf)),
                contextlib.redirect_stderr(_Tee(sys.stderr, buf)),
            ):
                outputs[name] = fn()
        except dq.DQCheckFailed as e:
            status, exit_code, err, failure = "failed", 2, repr(e), e
        except Exception as e:  # noqa: BLE001 - logged + manifest + re-raise
            status, exit_code, err, failure = "failed", 1, repr(e), e
        duration = round(time.monotonic() - t0, 3)
        with open(log_path, "w") as f:
            f.write(buf.getvalue())
            if err:
                f.write(f"\nERROR: {err}\n")
            f.write(f"\n# stage={name} exit={exit_code} duration_s={duration}\n")
        results[name] = {
            "log": log_path,
            "status": status,
            "exit_code": exit_code,
            "duration_s": duration,
        }
        if failure is not None:
            break
    manifest = os.path.join(log_dir, f"{run_ts}_manifest.json")
    with open(manifest, "w") as f:
        json.dump({"run": run_ts, "stages": results}, f, indent=2)
    out = {"stages": results, "outputs": outputs, "manifest": manifest}
    if failure is not None:
        # logs + manifest are already durable; preserve the caller-facing
        # contract (DQCheckFailed propagates, parity with exit-code abort)
        raise failure
    return out


@dataclass(frozen=True)
class DailyConfig:
    source_url: str
    zones: medallion.Zones
    ts_col: str
    keep_cols: tuple[str, ...]
    date_col: str = "event_date"
    warn_only: bool = False
    # a DAILY pipeline must re-fetch by default — skip-if-exists is for
    # immutable archives (the reference's month-named TLC files), not a
    # fixed-name feed that updates in place
    refresh: bool = True


def run_daily(spark: SparkSession, cfg: DailyConfig, rules: list[dq.Rule]) -> dict:
    """fetch ≫ bronze ≫ silver(DQ-gated), returning per-stage metrics.
    Raises DQCheckFailed (exit-code-2 semantics) unless warn_only — but
    only after every stage's log and the run manifest are on disk
    (``{zones.artifacts}/logs/``), so a failed gate is still auditable
    from artifacts alone (parity: ``run_full_pipeline.ps1:112-124``)."""

    _fetched: dict = {}

    def _fetch():
        _fetched["fetch"] = sources.fetch_to_raw(
            cfg.source_url,
            f"{cfg.zones.raw}/input.parquet",
            skip_if_exists=not cfg.refresh,
        )
        return _fetched["fetch"]

    def _bronze():
        return medallion.run_bronze(
            spark,
            str(_fetched["fetch"]),
            cfg.zones.bronze,
            ts_col=cfg.ts_col,
            keep_cols=list(cfg.keep_cols),
            date_col=cfg.date_col,
        )

    def _silver():
        return medallion.run_silver(
            spark,
            cfg.zones.bronze,
            cfg.zones.silver,
            cfg.zones.quarantine,
            rules=rules,
            artifacts_dir=cfg.zones.artifacts,
            warn_only=cfg.warn_only,
            partition_by=cfg.date_col,
        )

    staged = run_staged(
        [("fetch", _fetch), ("bronze", _bronze), ("silver", _silver)],
        log_dir=f"{cfg.zones.artifacts}/logs",
    )
    return {
        "bronze": staged["outputs"]["bronze"],
        "dq": staged["outputs"]["silver"].to_dict(),
        "stages": staged["stages"],
        "manifest": staged["manifest"],
    }


def build_airflow_dag(schedule: str = "0 3 * * *"):
    """Optional Airflow DAG, task-per-stage via the CLI (parity with the
    reference's BashOperators). Gated: Airflow is not a dependency of the
    engine; returns None when unavailable."""
    try:
        from airflow import DAG
        from airflow.operators.bash import BashOperator
    except ImportError:
        return None
    import datetime as dt

    with DAG(
        dag_id="medallion_daily",
        schedule=schedule,
        start_date=dt.datetime(2024, 1, 1),
        catchup=False,
    ) as dag:
        bronze = BashOperator(
            task_id="bronze",
            bash_command=(
                "python -m realtime_data_pipeline_spark.cli bronze "
                "--raw {{ var.value.raw }} --bronze {{ var.value.bronze }} "
                "--ts-col {{ var.value.ts_col }} "
                "--keep-cols {{ var.value.keep_cols }}"
            ),
        )
        silver = BashOperator(
            task_id="silver",
            bash_command=(
                "python -m realtime_data_pipeline_spark.cli silver "
                "--bronze {{ var.value.bronze }} "
                "--silver {{ var.value.silver }} "
                "--quarantine {{ var.value.quarantine }}"
            ),
        )
        bronze >> silver
    return dag
