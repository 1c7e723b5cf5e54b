"""X5: the multimodal plumbing must have a stable schema, deterministic
stubbed decode, metadata-only pruning, and correct row expansion."""

from __future__ import annotations

from realtime_data_pipeline_spark import multimodal


def media_df(spark, sf_dir, n=20):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n)
    return multimodal.attach_fake_media(docs, "doc_id")


def test_media_schema(spark, sf_dir):
    df = media_df(spark, sf_dir)
    f = {x.name: x.dataType.simpleString() for x in df.schema.fields}
    assert f["media"] == (
        "struct<data:binary,meta:struct<format:string,width:int,height:int,"
        "n_frames:int,source_id:bigint>>"
    )


def test_metadata_prunes_payload(spark, sf_dir):
    """Selecting only metadata must not read the binary payload column."""
    df = media_df(spark, sf_dir)
    out = df.select("media.meta.width", "media.meta.format")
    assert all("binary" not in x.dataType.simpleString() for x in out.schema.fields)


def test_decode_deterministic_and_shaped(spark, sf_dir):
    df = media_df(spark, sf_dir)
    a = multimodal.decode_media(df).toPandas().sort_values("source_id")
    b = multimodal.decode_media(df).toPandas().sort_values("source_id")
    assert len(a) == 20
    assert list(a.columns) == [
        "source_id", "format", "width", "height", "mean_intensity", "feature",
    ]
    assert (a["source_id"].values == b["source_id"].values).all()
    assert (a["mean_intensity"].values == b["mean_intensity"].values).all()
    assert all(len(f) == 16 for f in a["feature"])
    # pseudo-pixels are 0..255; pooled features normalized to [0, 1]
    assert a["mean_intensity"].between(0, 255).all()
    assert all((0.0 <= f).all() and (f <= 1.0).all() for f in a["feature"])


def test_real_decode_boundary_is_explicit(spark, sf_dir):
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media_df(spark, sf_dir), real_decode=True)


def test_frame_sampling_expands_rows(spark, sf_dir):
    df = media_df(spark, sf_dir)
    frames = multimodal.sample_frames(df, every_k=2).toPandas()
    meta = df.select("media.meta.source_id", "media.meta.n_frames").toPandas()
    expected = int(sum((n + 1) // 2 for n in meta["n_frames"]))
    assert len(frames) == expected
    assert (frames["frame_index"] % 2 == 0).all()
    assert all(len(f) == 16 for f in frames["frame_feature"])
