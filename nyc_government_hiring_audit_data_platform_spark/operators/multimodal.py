"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. Three decoder modes:

- ``decoder="ppm"``: a REAL decode path - a pure-numpy PPM (P6) codec
  (header parse incl. comments, raw 8-bit RGB payload, nearest-neighbor
  resampling). Actual image bytes are decoded, transformed and
  re-encoded end-to-end with no external library.
- ``decoder="fake"`` (default): deterministic pseudo-frames from the
  raw bytes, for mixed-media plumbing runs (schema, batching,
  partitioning, UDF signatures are identical to the real path).
- ``decoder="real"``: the Pillow/torchaudio/ffmpeg plug-point for
  compressed formats (PNG/JPEG/WAV/MP4); raises NotImplementedError
  because those libraries are unavailable in this container.

Scale notes: media rows are wide (MBs per row), so the operators
repartition by byte budget rather than row count, keep Arrow batches
small (maxRecordsInBatch should be lowered for these stages), and never
collect binaries to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("width", IntegerType()),     # -1 when unknown
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def make_media_fixture(spark, n_rows: int = 64) -> DataFrame:
    """Deterministic opaque-binary fixture (no real codecs involved)."""
    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + (i % 8) * 32 if kind != "audio" else -1,
                64 + (i % 5) * 32 if kind != "audio" else -1,
                -1 if kind == "image" else 1000 + i * 250,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# pure-numpy PPM (P6) codec - the real image decode path
# ---------------------------------------------------------------------------

PPM_MIME = "image/x-portable-pixmap"


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6, maxval 255)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) bytes to an (h, w, 3) uint8 array.

    Full header grammar: magic, then width/height/maxval separated by
    arbitrary whitespace with '#' comments, then ONE whitespace byte
    before the raster."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(data) and data[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(h, w) <= max_side, aspect
    preserved; arrays already small enough pass through unchanged."""
    h, w = arr.shape[:2]
    side = max(h, w)
    if side <= max_side:
        return arr
    scale = max_side / side
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    rows = np.minimum((np.arange(nh) / scale).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(nw) / scale).astype(np.int64), w - 1)
    return arr[rows][:, cols]


def make_ppm_media_fixture(spark, n_rows: int = 24) -> DataFrame:
    """MEDIA_SCHEMA rows whose payloads are REAL encoded PPM images
    (deterministic RGB gradients of varying sizes)."""
    rows = []
    for i in range(n_rows):
        h, w = 16 + (i % 5) * 24, 16 + (i * 7 % 9) * 16
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [
                (xx * 255 // max(1, w - 1)).astype(np.uint8),
                (yy * 255 // max(1, h - 1)).astype(np.uint8),
                np.full((h, w), i * 11 % 256, dtype=np.uint8),
            ],
            axis=2,
        )
        rows.append((i, "image", PPM_MIME, bytearray(encode_ppm(arr)), w, h, -1))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def repartition_by_bytes(
    df: DataFrame, payload_col: str = "payload", target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Partition media rows by cumulative byte budget, not row count -
    a 128 MB budget keeps Arrow transfer and task memory bounded even
    when individual payloads vary by 1000x."""
    sized = df.withColumn("_sz", F.length(F.col(payload_col)).cast("long"))
    total = sized.agg(F.sum("_sz")).collect()[0][0] or 1
    n_parts = max(1, int(total // target_partition_bytes) + 1)
    return sized.repartition(n_parts).drop("_sz")


_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "mean_byte double, frame_count int"
)


def _decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-decode: bytes -> uint8 'pixel' array."""
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage: per Arrow batch,
    emit (id, kind, size, content hash, mean pixel/byte value, frame
    count).

    ``decoder="ppm"`` DECODES the payload (pure-numpy P6 parser) and
    computes mean_byte over the raster pixels - a real end-to-end decode.
    ``decoder="real"`` is the plug-point for Pillow / torchaudio /
    ffmpeg; it raises here because those libraries are unavailable."""

    def _mean(payload: bytes, mime: str) -> float:
        if not len(payload):
            return 0.0
        if decoder == "ppm" and mime == PPM_MIME:
            return float(decode_ppm(bytes(payload)).mean())
        return float(_decode_fake(bytes(payload)).mean())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "real decoders (Pillow/ffmpeg) are not available in this "
                    "container; use decoder='ppm' (pure-numpy, uncompressed "
                    "images) or decoder='fake' for plumbing runs"
                )
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
                "mean_byte": [
                    _mean(b, m) for b, m in zip(pdf["payload"], pdf["mime"])
                ],
                "frame_count": pdf["duration_ms"].map(
                    lambda d: max(1, int(d) // 40) if int(d) > 0 else 1
                ).astype("int32"),
            }
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(df: DataFrame, every_nth: int = 25, decoder: str = "fake") -> DataFrame:
    """Frame sampling as a one-to-many mapInPandas: each video row
    explodes into every_nth-spaced pseudo-frames. The fake decoder
    slices the payload deterministically; a real one would seek+decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":  # pragma: no cover
                raise NotImplementedError("real frame decode unavailable here")
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                payload = bytes(row["payload"])
                n_frames = max(1, int(row["duration_ms"]) // 40)
                for fi in range(0, n_frames, every_nth):
                    lo = (fi * 97) % max(1, len(payload) - 16)
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    frames.append(payload[lo : lo + 16])
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": pd.Series(frames, dtype=object)}
            )

    return df.mapInPandas(gen, schema=_FRAME_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256, decoder: str = "fake") -> DataFrame:
    """Resize: passes non-images through untouched; for images,
    ``decoder="ppm"`` runs the REAL path - decode P6 payload,
    nearest-neighbor resample to max_side (aspect preserved), re-encode,
    and update width/height to the actual new raster dims. ``"fake"``
    only rewrites metadata/truncates bytes (plumbing runs); ``"real"``
    is the Pillow plug-point for compressed formats."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":  # pragma: no cover
                raise NotImplementedError(
                    "real compressed-image resize unavailable here; "
                    "decoder='ppm' resizes uncompressed P6 payloads"
                )
            out = pdf.copy()
            is_img = out["kind"] == "image"
            if decoder == "ppm":
                for idx in out.index[is_img]:
                    if out.at[idx, "mime"] != PPM_MIME:
                        continue
                    arr = resize_nearest(
                        decode_ppm(bytes(out.at[idx, "payload"])), max_side
                    )
                    out.at[idx, "payload"] = bytearray(encode_ppm(arr))
                    out.at[idx, "height"], out.at[idx, "width"] = arr.shape[:2]
            else:
                def clamp(v):
                    v = int(v)
                    return min(v, max_side) if v > 0 else v
                out.loc[is_img, "width"] = out.loc[is_img, "width"].map(clamp)
                out.loc[is_img, "height"] = out.loc[is_img, "height"].map(clamp)
                out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(
                    lambda b: bytes(b)[: max(16, len(b) // 4)]
                )
            yield out

    return df.mapInPandas(gen, schema=MEDIA_SCHEMA)
