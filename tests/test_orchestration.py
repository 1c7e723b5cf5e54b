"""End-to-end daily pipeline: fetch (file://) ≫ bronze ≫ DQ-gated silver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import dq, medallion, orchestration


def test_run_daily_end_to_end(spark, tmp_path):
    src = tmp_path / "remote.parquet"
    spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (2, "2024-01-01 11:00:00", -2.0),
            (3, "2024-01-02 10:00:00", 7.0),
        ],
        "event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))

    # fetch_to_raw downloads a single file; point it at the one part file
    import glob
    import pathlib

    part = glob.glob(str(src / "part-*.parquet"))[0]
    cfg = orchestration.DailyConfig(
        source_url=pathlib.Path(part).as_uri(),
        zones=medallion.Zones(str(tmp_path / "zones")),
        ts_col="ts",
        keep_cols=("event_id", "ts", "value"),
        warn_only=True,
    )
    rules = [dq.Rule("neg_value", F.col("value") < 0)]
    out = orchestration.run_daily(spark, cfg, rules)
    assert out["bronze"]["rows"] == 3
    assert out["dq"]["rules"]["neg_value"]["violations"] == 1
    assert spark.read.parquet(cfg.zones.silver).count() == 2
    assert spark.read.parquet(cfg.zones.quarantine).count() == 1


def test_run_daily_gate_raises(spark, tmp_path):
    import glob
    import pathlib

    src = tmp_path / "remote2.parquet"
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", -5.0)], "event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(str(src))
    part = glob.glob(str(src / "part-*.parquet"))[0]
    cfg = orchestration.DailyConfig(
        source_url=pathlib.Path(part).as_uri(),
        zones=medallion.Zones(str(tmp_path / "zones2")),
        ts_col="ts",
        keep_cols=("event_id", "ts", "value"),
    )
    with pytest.raises(dq.DQCheckFailed):
        orchestration.run_daily(spark, cfg, [dq.Rule("neg", F.col("value") < 0)])


def test_airflow_dag_gated(spark):
    # airflow absent in this environment -> None, never an ImportError
    assert orchestration.build_airflow_dag() is None


def test_run_daily_writes_stage_logs(spark, tmp_path):
    """Round-3 verdict task 6: per-stage timestamped log artifacts + a
    manifest with exit codes, parity with run_full_pipeline.ps1:112-124."""
    import glob
    import json
    import pathlib

    src = tmp_path / "remote3.parquet"
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0)], "event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(str(src))
    part = glob.glob(str(src / "part-*.parquet"))[0]
    cfg = orchestration.DailyConfig(
        source_url=pathlib.Path(part).as_uri(),
        zones=medallion.Zones(str(tmp_path / "zones3")),
        ts_col="ts",
        keep_cols=("event_id", "ts", "value"),
        warn_only=True,
    )
    out = orchestration.run_daily(
        spark, cfg, [dq.Rule("neg", F.col("value") < 0)]
    )
    assert set(out["stages"]) == {"fetch", "bronze", "silver"}
    for name, st in out["stages"].items():
        assert st["exit_code"] == 0 and st["status"] == "ok"
        assert name in st["log"]
        assert pathlib.Path(st["log"]).exists()
        assert f"exit=0" in pathlib.Path(st["log"]).read_text()
    manifest = json.loads(pathlib.Path(out["manifest"]).read_text())
    assert manifest["stages"]["silver"]["exit_code"] == 0


def test_run_daily_failed_gate_still_writes_logs(spark, tmp_path):
    """A DQ-failed run must leave logs + manifest on disk (exit_code 2 for
    the silver stage) BEFORE DQCheckFailed propagates."""
    import glob
    import json
    import pathlib

    src = tmp_path / "remote4.parquet"
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", -5.0)], "event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(str(src))
    part = glob.glob(str(src / "part-*.parquet"))[0]
    cfg = orchestration.DailyConfig(
        source_url=pathlib.Path(part).as_uri(),
        zones=medallion.Zones(str(tmp_path / "zones4")),
        ts_col="ts",
        keep_cols=("event_id", "ts", "value"),
    )
    with pytest.raises(dq.DQCheckFailed):
        orchestration.run_daily(spark, cfg, [dq.Rule("neg", F.col("value") < 0)])
    logs = sorted(pathlib.Path(cfg.zones.artifacts, "logs").iterdir())
    names = [p.name for p in logs]
    assert any("silver" in n for n in names) and any(
        "_manifest.json" in n for n in names
    )
    manifest = json.loads(next(p for p in logs if "manifest" in p.name).read_text())
    assert manifest["stages"]["silver"]["exit_code"] == 2
    assert manifest["stages"]["silver"]["status"] == "failed"
    assert manifest["stages"]["bronze"]["exit_code"] == 0
