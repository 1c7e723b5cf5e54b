"""Multimodal column support (X5): opaque binary media + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
operators.

The Spark-side contract is the real deliverable here:

* media are ``struct<data: binary, meta: struct<...>>`` columns — binary
  payloads stay opaque to Catalyst (never filtered/joined on), metadata is
  columnar and prunable, so a query touching only ``media.meta.format``
  never deserializes a byte of payload;
* all per-item compute runs through ``mapInPandas`` — Arrow batches in and
  out, schema declared up front, one Python worker per partition; this is
  the shape a real PIL/ffmpeg decoder drops into;
* DECODING IS STUBBED: the container has no image/audio codecs, so
  ``fake_decode`` derives deterministic pseudo-pixels from the payload
  bytes. Swap ``_decode_payload`` for the real library; nothing else
  (schema, partitioning, batch handling) changes. ``real_decode=True``
  raises ``NotImplementedError`` to make the boundary explicit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "format string, width int, height int, n_frames int, source_id bigint"
)
MEDIA_SCHEMA = f"struct<data: binary, meta: struct<{MEDIA_META_SCHEMA}>>"

DECODED_SCHEMA = (
    "source_id bigint, format string, width int, height int, "
    "mean_intensity double, feature array<float>"
)

FRAME_SCHEMA = (
    "source_id bigint, frame_index int, frame_feature array<float>"
)

_FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, id_col: str, fmt: str = "img") -> DataFrame:
    """Give each row a deterministic synthetic media column (payload =
    sha2-derived bytes) so the multimodal plumbing is exercisable on the
    text fixtures. Pure JVM expressions — no Python in the attach path."""
    payload = F.to_binary(
        F.sha2(F.concat(F.lit(fmt), F.col(id_col).cast("string")), 256),
        F.lit("hex"),
    )
    meta = F.struct(
        F.lit(fmt).alias("format"),
        (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
        (F.pmod(F.col(id_col), F.lit(8)) + 1).cast("int").alias("n_frames"),
        F.col(id_col).cast("bigint").alias("source_id"),
    )
    return df.withColumn(
        "media", F.struct(payload.alias("data"), meta.alias("meta"))
    )


def media_meta(df: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """Metadata-only view of a media column: extracts ``media.meta`` WITHOUT
    ever materializing the binary payload.

    The extraction is deliberately a two-step projection (``media.meta``
    first, fields later): Catalyst's CollapseProject refuses to inline an
    expensive producer expression referenced more than once, so selecting
    four ``media.meta.x`` fields directly against the attach projection
    keeps the payload expression alive in the plan. A single ``media.meta``
    reference collapses, SimplifyExtractValueOps then rewrites the struct
    field access and the payload expression is eliminated entirely —
    CI-asserted in tests/test_plans.py. On a STORED table the same shape
    becomes parquet nested-column pruning (ReadSchema lists meta only)."""
    return df.select(*(extra_cols or []), F.col("media.meta").alias("meta"))


def decode_media(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode + featurize each media item via mapInPandas. Output schema is
    fixed (``DECODED_SCHEMA``); the input partitioning is preserved — no
    shuffle, one Arrow round-trip per partition.

    The closure is deliberately self-contained (locals + library imports
    only): Spark pickles it to Python workers that may not have this
    package on their path."""
    if real_decode:
        raise NotImplementedError(
            "real codecs unavailable in this environment; wire PIL/libav "
            "into the decode closure below — schema and batching are ready"
        )
    feature_dim = _FEATURE_DIM

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_payload(data: bytes, width: int, height: int) -> np.ndarray:
            # STUB decoder — the PIL/libav call site. Deterministic:
            # expands the payload hash into width*height pseudo-pixels.
            seed = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
            rng = np.random.RandomState(seed)
            return rng.randint(0, 256, size=(height, width)).astype(np.float64)

        for pdf in batches:
            out = []
            for m in pdf["media"]:
                data, meta = m["data"], m["meta"]
                px = decode_payload(bytes(data), meta["width"], meta["height"])
                flat = px.ravel()
                # fixed-dim pooled feature: mean of equal slices
                feat = np.array(
                    [s.mean() for s in np.array_split(flat, feature_dim)],
                    dtype=np.float32,
                ) / 255.0
                out.append(
                    (
                        meta["source_id"],
                        meta["format"],
                        meta["width"],
                        meta["height"],
                        float(px.mean()),
                        feat,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "source_id", "format", "width", "height",
                    "mean_intensity", "feature",
                ],
            )

    return df.select("media").mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction as its own operator: (source_id, feature) per
    media item. A projection over :func:`decode_media` — Catalyst prunes
    the unused decode outputs from the Arrow batch schema; the pooled
    feature math itself lives in the decode closure."""
    return decode_media(df).select("source_id", "feature")


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize each media item to (width, height), returning the SAME
    ``media`` struct shape (payload + updated meta) so resize composes
    with every other media operator (decode, frame-sample, meta-only
    queries) — the standard normalize-before-featurize step.

    The resize math is REAL (block-mean pooling over a pixel grid, the
    area-interpolation kernel); only the codec boundary is stubbed: input
    pixels come from the deterministic fake decoder and the output
    payload is the raw little-endian uint8 bitmap (``tobytes``), which a
    real pipeline would swap for PIL's decode/encode calls. Partitioning
    preserved, one Arrow round-trip, no shuffle."""
    out_schema = f"media {MEDIA_SCHEMA}"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_payload(data: bytes, w: int, h: int) -> np.ndarray:
            seed = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
            rng = np.random.RandomState(seed)
            return rng.randint(0, 256, size=(h, w)).astype(np.float64)

        def resize_axis(px: np.ndarray, dst: int, axis: int) -> np.ndarray:
            # separable resize: area-mean when shrinking (bin source rows
            # into target groups), nearest-neighbor when growing (binning
            # would leave zero-count target cells = black stripes)
            src = px.shape[axis]
            if dst == src:
                return px
            a = np.moveaxis(px, axis, 0)
            if dst < src:
                bins = (np.arange(src) * dst) // src
                out = np.zeros((dst,) + a.shape[1:])
                cnt = np.bincount(bins, minlength=dst).astype(np.float64)
                np.add.at(out, bins, a)
                out = out / cnt[(slice(None),) + (None,) * (out.ndim - 1)]
            else:
                out = a[(np.arange(dst) * src) // dst]
            return np.moveaxis(out, 0, axis)

        def block_mean(px: np.ndarray, w: int, h: int) -> np.ndarray:
            return resize_axis(resize_axis(px, h, 0), w, 1)

        for pdf in batches:
            rows = []
            for m in pdf["media"]:
                data, meta = m["data"], m["meta"]
                px = decode_payload(bytes(data), meta["width"], meta["height"])
                resized = block_mean(px, width, height)
                rows.append(
                    {
                        "data": np.clip(resized, 0, 255)
                        .astype(np.uint8)
                        .tobytes(),
                        "meta": {
                            "format": meta["format"],
                            "width": width,
                            "height": height,
                            "n_frames": meta["n_frames"],
                            "source_id": meta["source_id"],
                        },
                    }
                )
            yield pd.DataFrame({"media": rows})

    return df.select("media").mapInPandas(resize, schema=out_schema)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video-like media: emits one row per k-th frame —
    a row-expanding mapInPandas (the UDTF shape). Frame features are
    derived per (payload, frame_index), deterministic. Self-contained
    closure — see decode_media."""
    feature_dim = _FEATURE_DIM

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["media"]:
                data, meta = m["data"], m["meta"]
                for fi in range(0, meta["n_frames"], every_k):
                    seed = int.from_bytes(
                        hashlib.sha256(bytes(data) + fi.to_bytes(4, "big"))
                        .digest()[:4],
                        "big",
                    )
                    rng = np.random.RandomState(seed)
                    rows.append(
                        (
                            meta["source_id"],
                            fi,
                            rng.standard_normal(feature_dim).astype(np.float32),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["source_id", "frame_index", "frame_feature"]
            )

    return df.select("media").mapInPandas(sample, schema=FRAME_SCHEMA)
