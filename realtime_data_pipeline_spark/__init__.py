"""PySpark-native analytics engine with the capabilities of the
``realtime-data-pipeline`` reference (batch medallion ETL + data quality
gating + streaming ingest), extended with large-scale LLM-data operators
(dedup, similarity search, multimodal columns, text analysis).

Design stance (see SURVEY.md):

* DataFrame/SQL first — every operator is declared through the Catalyst
  optimizer; no hand-scheduled RDD code.
* Single-pass evaluation — the reference's multi-scan anti-patterns
  (4 ``count()`` actions for 4 DQ rules, per-column ``withColumn`` loops)
  are rewritten as one conditional aggregation / one ``select``.
* 100 TB posture — AQE on, broadcast joins for dims, partitioned layouts
  preserved end-to-end, no driver-side collects in any hot path.
"""

from realtime_data_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
