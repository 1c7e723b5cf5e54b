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
* decoding: ``real_decode=True`` runs REAL codecs for the two formats
  decodable without third-party libraries — PNG (pure-Python inflate +
  per-row unfilter from the RFC 2083 spec, 8-bit gray/RGB/RGBA) and
  WAV-PCM (stdlib ``wave``, 8/16/32-bit) — and raises
  ``NotImplementedError`` for formats that genuinely need external
  codecs (JPEG/MP3/video), keeping that boundary explicit. The default
  ``fake_decode`` path derives deterministic pseudo-pixels from the
  payload bytes so the plumbing is exercisable on text fixtures.
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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/px


def decode_png(data: bytes) -> np.ndarray:
    """REAL PNG decode, implemented from the public spec (RFC 2083) with
    nothing but stdlib zlib: parse chunks, inflate IDAT, undo the five
    per-row filters. Supports 8-bit depth, gray / gray+alpha / RGB /
    RGBA, non-interlaced (the overwhelmingly common case); anything else
    raises. Returns ``(h, w, channels)`` uint8. The Up/None filters
    vectorize; Sub/Average/Paeth are sequential by definition (each byte
    depends on the reconstructed left neighbor) — fine for thumbnails
    and tests, and the call site is exactly where a SIMD codec slots in
    at production scale."""
    import struct
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = len(_PNG_SIG), [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG without IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = hdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant unsupported here (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}) — 8-bit "
            "non-interlaced gray/RGB/RGBA only"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    i = 0
    for y in range(h):
        f = raw[i]
        line = np.frombuffer(raw[i + 1 : i + 1 + stride], dtype=np.uint8)
        i += 1 + stride
        if f == 0:  # None
            cur = line.copy()
        elif f == 2:  # Up (uint8 addition wraps mod 256 — the spec's rule)
            cur = line + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG row filter {f} out of range")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(px: np.ndarray) -> bytes:
    """Minimal spec-correct PNG encoder (filter 0 rows, one zlib IDAT) —
    enough to round-trip :func:`decode_png` and to emit payloads real
    external tools open. 8-bit gray/gray+alpha/RGB/RGBA."""
    import struct
    import zlib

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV-PCM decode via the stdlib ``wave`` module: returns
    float64 samples in [-1, 1] shaped ``(n_frames, channels)`` plus the
    sample rate. 8/16/32-bit integer PCM; float/ADPCM WAVs raise."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        sr = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned by spec
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        arr = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64)
            / 2147483648.0
        )
    else:
        raise NotImplementedError(f"WAV sample width {sw} unsupported")
    return arr.reshape(-1, ch), sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit PCM WAV encoder (stdlib ``wave``) — the test/round-trip
    twin of :func:`decode_wav`. ``samples`` float in [-1, 1], 1-D or
    ``(n, channels)``."""
    import io
    import wave

    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    ints = (np.clip(samples, -1.0, 1.0) * 32767.0).round().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(ints.tobytes())
    return buf.getvalue()


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


def attach_png_media(
    df: DataFrame, id_col: str, width: int = 16, height: int = 12
) -> DataFrame:
    """Attach a REAL PNG payload per row — deterministic grayscale
    pixels seeded by the id, encoded with :func:`encode_png` inside an
    Arrow-batched ``mapInPandas`` (the encode half of the real-codec
    path; :func:`decode_media` with ``real_decode=True`` inverts it
    exactly). Returns ``(id_col, media)`` — join back on the id if the
    other columns are needed. Self-contained closure; same meta struct
    as :func:`attach_fake_media` so every media operator composes."""
    out_schema = f"{id_col} bigint, media {MEDIA_SCHEMA}"
    w, h = width, height

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def png(px: np.ndarray) -> bytes:
            def chunk(t: bytes, d: bytes) -> bytes:
                return (
                    struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
                )

            hh, ww = px.shape
            raw = b"".join(b"\x00" + px[y].tobytes() for y in range(hh))
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(
                    b"IHDR",
                    struct.pack(">IIBBBBB", ww, hh, 8, 0, 0, 0, 0),
                )
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                px = (
                    np.random.RandomState(int(i) & 0x7FFFFFFF)
                    .randint(0, 256, size=(h, w))
                    .astype(np.uint8)
                )
                rows.append(
                    {
                        id_col: int(i),
                        "media": {
                            "data": png(px),
                            "meta": {
                                "format": "png",
                                "width": w,
                                "height": h,
                                "n_frames": 1,
                                "source_id": int(i),
                            },
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col).cast("bigint").alias(id_col)).mapInPandas(
        attach, schema=out_schema
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

    ``real_decode=True`` dispatches on the payload's MAGIC BYTES and runs
    the real codecs implemented in this module: PNG (:func:`decode_png`;
    width/height/mean come from the actual pixels, channel-averaged) and
    WAV-PCM (:func:`decode_wav`; width = frames, height = channels, the
    "intensity" is mean |amplitude|, feature pooled over the sample
    stream). Payloads that are neither — JPEG, MP3, video containers —
    raise ``NotImplementedError`` naming the genuinely external-codec
    boundary. The default fake path derives deterministic pseudo-pixels
    from the payload hash so the plumbing runs on text fixtures.

    The closure is deliberately self-contained (locals + library imports
    only): Spark pickles it to Python workers that may not have this
    package on their path — which is also why the real branch re-binds
    the codec functions as locals."""
    feature_dim = _FEATURE_DIM
    png_codec, wav_codec = decode_png, decode_wav

    def pooled(flat: np.ndarray, scale: float) -> np.ndarray:
        return np.array(
            [s.mean() for s in np.array_split(flat, feature_dim)],
            dtype=np.float32,
        ) / scale

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_payload(data: bytes, width: int, height: int) -> np.ndarray:
            # deterministic pseudo-pixels from the payload hash — the
            # plumbing-only path for formats without a native codec
            seed = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
            rng = np.random.RandomState(seed)
            return rng.randint(0, 256, size=(height, width)).astype(np.float64)

        for pdf in batches:
            out = []
            for m in pdf["media"]:
                data, meta = bytes(m["data"]), m["meta"]
                if real_decode:
                    if data.startswith(b"\x89PNG\r\n\x1a\n"):
                        px = png_codec(data).astype(np.float64)
                        gray = px.mean(axis=2)
                        row = (
                            meta["source_id"], "png",
                            int(gray.shape[1]), int(gray.shape[0]),
                            float(gray.mean()), pooled(gray.ravel(), 255.0),
                        )
                    elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                        samples, _sr = wav_codec(data)
                        row = (
                            meta["source_id"], "wav",
                            int(samples.shape[0]), int(samples.shape[1]),
                            float(np.abs(samples).mean()),
                            pooled(samples.ravel(), 1.0),
                        )
                    else:
                        raise NotImplementedError(
                            "payload is neither PNG nor WAV-PCM — JPEG/"
                            "MP3/video need external codecs (PIL/libav) "
                            "not present in this environment; the Arrow "
                            "plumbing and schema are format-agnostic"
                        )
                else:
                    px = fake_payload(data, meta["width"], meta["height"])
                    row = (
                        meta["source_id"], meta["format"],
                        meta["width"], meta["height"],
                        float(px.mean()), pooled(px.ravel(), 255.0),
                    )
                out.append(row)
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
