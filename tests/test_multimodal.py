"""X5: the multimodal plumbing must have a stable schema, deterministic
stubbed decode, metadata-only pruning, and correct row expansion."""

from __future__ import annotations

from realtime_data_pipeline_spark import multimodal
import pytest


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
    """real_decode handles PNG and WAV natively; any OTHER payload (the
    fake sha2 bytes here) must fail loudly naming the external-codec
    boundary, not decode garbage."""
    import pytest

    with pytest.raises(Exception, match="neither PNG nor WAV"):
        multimodal.decode_media(
            media_df(spark, sf_dir), real_decode=True
        ).collect()


def test_png_codec_roundtrip_all_filters():
    """decode_png is a real spec decoder: it must invert encode_png
    exactly AND reconstruct rows written with every PNG filter type
    (0-4), for gray, RGB and RGBA."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(42)
    for ch in (1, 3, 4):
        px = rng.randint(0, 256, size=(13, 17, ch)).astype(np.uint8)
        assert (
            multimodal.decode_png(multimodal.encode_png(px)) == px
        ).all(), f"filter-0 roundtrip failed ch={ch}"

    # hand-filter an image with each filter type and decode it
    def forward_filter(px: np.ndarray, f: int) -> bytes:
        h, w, ch = px.shape
        stride = w * ch
        flat = px.reshape(h, stride).astype(int)
        out = b""
        prev = np.zeros(stride, dtype=int)
        for y in range(h):
            cur = flat[y]
            line = np.zeros(stride, dtype=int)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                line[x] = (cur[x] - pred) % 256
            out += bytes([f]) + bytes(line.astype(np.uint8))
            prev = cur
        return out

    def wrap(raw: bytes, w: int, h: int, color_type: int) -> bytes:
        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0),
            )
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    px = rng.randint(0, 256, size=(9, 11, 3)).astype(np.uint8)
    for f in range(5):
        data = wrap(forward_filter(px, f), 11, 9, 2)
        got = multimodal.decode_png(data)
        assert (got == px).all(), f"filter {f} decode failed"


def test_wav_codec_roundtrip():
    import numpy as np

    sr = 8000
    t = np.arange(sr) / sr
    stereo = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.25 * np.sin(2 * np.pi * 220 * t)],
        axis=1,
    )
    data = multimodal.encode_wav(stereo, sr)
    samples, got_sr = multimodal.decode_wav(data)
    assert got_sr == sr and samples.shape == (sr, 2)
    # 16-bit quantization: within one LSB
    assert np.abs(samples - stereo).max() <= 1.0 / 32767 + 1e-9


def test_real_decode_png_and_wav_through_spark(spark):
    """End to end through the Arrow path: real PNG and WAV payloads in a
    media column decode to their true dimensions and intensities
    (numpy ground truth), side by side in one DataFrame."""
    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(10, 12, 3)).astype(np.uint8)
    png = multimodal.encode_png(px)
    mono = 0.3 * np.sin(2 * np.pi * 100 * np.arange(400) / 4000)
    wav = multimodal.encode_wav(mono, 4000)

    rows = [
        ((bytearray(png), ("png", 0, 0, 1, 1)),),
        ((bytearray(wav), ("wav", 0, 0, 1, 2)),),
    ]
    df = spark.createDataFrame(rows, f"media {multimodal.MEDIA_SCHEMA}")
    got = {
        r.source_id: r
        for r in multimodal.decode_media(df, real_decode=True).collect()
    }
    g1 = got[1]
    assert (g1.format, g1.width, g1.height) == ("png", 12, 10)
    assert abs(g1.mean_intensity - px.astype(float).mean(axis=2).mean()) < 1e-9
    assert len(g1.feature) == 16

    g2 = got[2]
    assert (g2.format, g2.width, g2.height) == ("wav", 400, 1)
    dec, _ = multimodal.decode_wav(wav)
    assert abs(g2.mean_intensity - np.abs(dec).mean()) < 1e-9
    assert len(g2.feature) == 16


def test_frame_sampling_expands_rows(spark, sf_dir):
    df = media_df(spark, sf_dir)
    frames = multimodal.sample_frames(df, every_k=2).toPandas()
    meta = df.select("media.meta.source_id", "media.meta.n_frames").toPandas()
    expected = int(sum((n + 1) // 2 for n in meta["n_frames"]))
    assert len(frames) == expected
    assert (frames["frame_index"] % 2 == 0).all()
    assert all(len(f) == 16 for f in frames["frame_feature"])


def test_resize_media_shape_and_mean_preservation(spark):
    """resize_media keeps the media struct contract (composable with
    meta/decode ops), hits the target dims, and — real resize math —
    block-mean pooling preserves mean intensity within rounding."""
    import numpy as np
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import multimodal

    src = multimodal.attach_fake_media(
        spark.range(0, 20).select(F.col("id").alias("doc_id")), "doc_id"
    )
    resized = multimodal.resize_media(src, width=8, height=8)
    rows = resized.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.media.meta.width == 8 and r.media.meta.height == 8
        assert len(bytes(r.media.data)) == 64  # 8x8 uint8 bitmap

    # meta-only projection still works on the resized output
    meta = multimodal.media_meta(resized).collect()
    assert {m.meta.source_id for m in meta} == set(range(20))

    # mean preservation vs the original decoded pixels
    import hashlib

    orig = {r.media.meta.source_id: r.media for r in src.collect()}
    for r in rows:
        m = orig[r.media.meta.source_id]
        seed = int.from_bytes(
            hashlib.sha256(bytes(m.data)).digest()[:4], "big"
        )
        px = (
            np.random.RandomState(seed)
            .randint(0, 256, size=(m.meta.height, m.meta.width))
            .astype(np.float64)
        )
        got_mean = np.frombuffer(bytes(r.media.data), dtype=np.uint8).mean()
        assert abs(got_mean - px.mean()) < 8.0  # uint8 rounding + binning


def test_resize_media_deterministic(spark):
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import multimodal

    src = multimodal.attach_fake_media(
        spark.range(0, 10).select(F.col("id").alias("doc_id")), "doc_id"
    )
    a = {
        r.media.meta.source_id: bytes(r.media.data)
        for r in multimodal.resize_media(src, 6, 6).collect()
    }
    b = {
        r.media.meta.source_id: bytes(r.media.data)
        for r in multimodal.resize_media(src, 6, 6).collect()
    }
    assert a == b


def test_extract_features_projection(spark):
    """extract_features yields (source_id, fixed-dim feature) and matches
    the decode path's feature exactly."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import multimodal

    src = multimodal.attach_fake_media(
        spark.range(0, 10).select(F.col("id").alias("doc_id")), "doc_id"
    )
    feats = {r.source_id: r.feature for r in multimodal.extract_features(src).collect()}
    via_decode = {
        r.source_id: r.feature for r in multimodal.decode_media(src).collect()
    }
    assert feats == via_decode
    assert all(len(v) == 16 for v in feats.values())


def test_resize_media_upscale_no_black_stripes(spark):
    """Upscaling must duplicate source cells (nearest), never leave
    zero-count bins — the binning-only first cut produced black stripes
    for any target larger than the source."""
    import numpy as np
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark import multimodal

    src = multimodal.attach_fake_media(
        spark.range(0, 8).select(F.col("id").alias("doc_id")), "doc_id"
    )
    # fixture media are 16..79 px; 96x96 upscales every item on both axes
    up = multimodal.resize_media(src, width=96, height=96).collect()
    for r in up:
        arr = np.frombuffer(bytes(r.media.data), dtype=np.uint8)
        assert arr.size == 96 * 96
        # a black stripe would zero out entire rows; random source pixels
        # make a fully-zero row astronomically unlikely otherwise
        rows_all_zero = (arr.reshape(96, 96) == 0).all(axis=1).sum()
        assert rows_all_zero == 0


@pytest.mark.slow
def test_attach_png_media_roundtrips_through_real_decode(spark):
    """The encode side (attach_png_media, executor-side real PNG encode)
    and the decode side (real_decode=True) are exact inverses: the
    decoded mean intensity equals the numpy ground truth of the seeded
    pixel grid for every id, twice (determinism)."""
    import numpy as np

    df = spark.range(0, 30).toDF("doc_id")
    media = multimodal.attach_png_media(df, "doc_id", width=16, height=12)
    got = {
        r.source_id: r
        for r in multimodal.decode_media(media, real_decode=True).collect()
    }
    assert len(got) == 30
    for i in (0, 7, 29):
        px = np.random.RandomState(i).randint(0, 256, size=(12, 16))
        r = got[i]
        assert (r.format, r.width, r.height) == ("png", 16, 12)
        assert abs(r.mean_intensity - px.mean()) < 1e-9
    again = {
        r.source_id: r.mean_intensity
        for r in multimodal.decode_media(media, real_decode=True).collect()
    }
    assert again == {k: v.mean_intensity for k, v in got.items()}
