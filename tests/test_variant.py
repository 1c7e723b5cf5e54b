"""VARIANT-path robustness: the documented malformed-to-NULL tolerance
of events_props_variant, exercised with payloads the clean fixture
cannot provide (review finding: parse_json would FAILFAST here)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_try_parse_json_tolerates_malformed_props(spark):
    df = spark.createDataFrame(
        [
            ("view", '{"k": 7}'),
            ("view", "not json at all"),
            ("click", '{"k": "not-an-int"}'),
            ("click", None),
        ],
        "event_type string, props string",
    )
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    rows = (
        df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.count("k").alias("n_with_k"))
        .orderBy("event_type")
        .collect()
    )
    assert [(r.event_type, r.n_events, r.n_with_k) for r in rows] == [
        ("click", 2, 0),
        ("view", 2, 1),
    ]
