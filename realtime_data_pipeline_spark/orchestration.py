"""Pipeline orchestration (parity: ``dags/etl_daily.py``).

The reference schedules fetch ≫ batch ≫ dq as three Airflow
``BashOperator`` subprocesses (``dags/etl_daily.py:20-35``, daily 03:00
cron at ``:14``). Here every stage is a library callable, so the same
graph runs under any scheduler — the optional Airflow DAG below shells
into the SAME entry points (one Spark session per task process, matching
the reference's process-per-stage isolation).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from realtime_data_pipeline_spark import dq, medallion, sources


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
    Raises DQCheckFailed (exit-code-2 semantics) unless warn_only."""
    raw_file = sources.fetch_to_raw(
        cfg.source_url,
        f"{cfg.zones.raw}/input.parquet",
        skip_if_exists=not cfg.refresh,
    )
    bronze_metrics = medallion.run_bronze(
        spark,
        str(raw_file),
        cfg.zones.bronze,
        ts_col=cfg.ts_col,
        keep_cols=list(cfg.keep_cols),
        date_col=cfg.date_col,
    )
    report = medallion.run_silver(
        spark,
        cfg.zones.bronze,
        cfg.zones.silver,
        cfg.zones.quarantine,
        rules=rules,
        artifacts_dir=cfg.zones.artifacts,
        warn_only=cfg.warn_only,
        partition_by=cfg.date_col,
    )
    return {"bronze": bronze_metrics, "dq": report.to_dict()}


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
