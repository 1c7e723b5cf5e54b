"""Bucketing: co-located fact joins must not shuffle.

At 100 TB, a fact-fact join you run every day should read from tables
bucketed on the join key — Spark then sort-merge-joins bucket-to-bucket
with NO Exchange on either side. This test proves the engine's layout
actually buys that plan."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        cust.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "b_cust"))
        .mode("overwrite")
        .saveAsTable("b_cust")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        c = spark.table("b_cust")
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_custkey", "o_totalprice"
        )
        n = joined.count()
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_write_bucketed_helper_joins_without_exchange(spark, sf_dir, tmp_path):
    """medallion.write_bucketed on both join sides -> zero-shuffle join."""
    from realtime_data_pipeline_spark import medallion

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    medallion.write_bucketed(
        lineitem, "wb_lineitem", 8, "l_orderkey",
        sort_by="l_orderkey", path=str(tmp_path / "wb_lineitem"),
    )
    medallion.write_bucketed(
        orders, "wb_orders", 8, "o_orderkey",
        sort_by="o_orderkey", path=str(tmp_path / "wb_orders"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("wb_lineitem")
        o = spark.table("wb_orders")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        assert joined.count() == lineitem.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS wb_lineitem")
        spark.sql("DROP TABLE IF EXISTS wb_orders")


def test_write_range_sorted_files_are_disjoint(spark, sf_dir, tmp_path):
    """Each output file must cover a non-overlapping range of the sort
    column (verified from the real parquet footers) — the property that
    lets min/max stats prune files for range predicates."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from realtime_data_pipeline_spark import medallion

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "sorted_orders")
    medallion.write_range_sorted(orders, out, "o_orderdate", num_files=6)

    spans = []
    for f in Path(out).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        # repartitionByRange can emit an empty partition -> empty file with
        # zero row groups; it covers no range, so skip it (round-3 advisory)
        if md.num_rows == 0 or md.num_row_groups == 0:
            continue
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderdate"
        )
        lo = min(md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) > 1
    spans.sort()
    for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= next_lo, f"overlapping file ranges: {spans}"
    # and the data still round-trips
    assert spark.read.parquet(out).count() == orders.count()


@pytest.mark.slow
def test_write_zordered_skips_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order contract: every file covers a small hyper-cube, so footer
    min/max ranges are narrow on BOTH clustered columns (a single-column
    range sort nails one column and leaves the other at ~full range)."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from realtime_data_pipeline_spark import medallion

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "z_orders")
    medallion.write_zordered(
        orders, out, ["o_custkey", "o_totalprice"], num_files=8
    )

    files = [p for p in Path(out).glob("*.parquet")]
    assert len(files) > 3

    def coverages(col_name):
        los, his = [], []
        for f in files:
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0 or md.num_row_groups == 0:
                continue
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col_name
            )
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            los.append(lo)
            his.append(hi)
        full = max(his) - min(los)
        return [(h - l) / full for l, h in zip(los, his)]

    for col in ("o_custkey", "o_totalprice"):
        cov = coverages(col)
        mean_cov = sum(cov) / len(cov)
        # a contiguous Morton range over 2 dims spans ~sqrt(fraction) of
        # each axis; 8 files -> ~0.35 ideal, loose-bounded for quantile
        # noise. The point: BOTH columns are well under full range.
        assert mean_cov < 0.75, f"{col}: mean coverage {mean_cov:.2f}"

    assert spark.read.parquet(out).count() == orders.count()


def test_write_zordered_single_column_degenerates_to_range_sort(spark, sf_dir, tmp_path):
    """One clustered column: the Morton code is just the rank, so the
    layout behaves like write_range_sorted (near-disjoint file ranges)
    and the data round-trips."""
    from realtime_data_pipeline_spark import medallion

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "z1")
    medallion.write_zordered(orders, out, ["o_totalprice"], num_files=4)
    assert spark.read.parquet(out).count() == orders.count()
