"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The container has no media libraries, so the
actual DECODE step is stubbed: ``decoder="fake"`` produces deterministic
pseudo-frames from the bytes (so the full Spark plumbing - schema,
batching, partitioning, UDF signatures - is real and tested), and
``decoder="real"`` raises NotImplementedError at the exact point where
Pillow/ffmpeg would plug in.

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
    emit (id, kind, size, content hash, mean byte value, frame count).

    ``decoder="real"`` is the plug-point for Pillow / torchaudio /
    ffmpeg; it raises here because those libraries are unavailable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "real decoders (Pillow/ffmpeg) are not available in this "
                    "container; use decoder='fake' for plumbing runs"
                )
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
                "mean_byte": pdf["payload"].map(
                    lambda b: float(_decode_fake(bytes(b)).mean()) if len(b) else 0.0
                ),
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
    """Resize plumbing: passes non-images through untouched, rewrites the
    (fake-)decoded payload and dimensions for images. Real resampling is
    the decoder plug-point."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":  # pragma: no cover
                raise NotImplementedError("real image resize unavailable here")
            def clamp(v):
                v = int(v)
                return min(v, max_side) if v > 0 else v
            out = pdf.copy()
            is_img = out["kind"] == "image"
            out.loc[is_img, "width"] = out.loc[is_img, "width"].map(clamp)
            out.loc[is_img, "height"] = out.loc[is_img, "height"].map(clamp)
            out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(
                lambda b: bytes(b)[: max(16, len(b) // 4)]
            )
            yield out

    return df.mapInPandas(gen, schema=MEDIA_SCHEMA)
