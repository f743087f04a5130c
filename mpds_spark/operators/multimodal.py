"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself (JPEG/PNG/audio codecs) is STUBBED — the image/audio
libraries are not in this container — behind `decoder=` hooks that raise
NotImplementedError unless a deterministic fake decoder is supplied. The
Spark-side plumbing is real and tested: schema, batch iteration, partition
behavior, output shapes.

Canonical schema (media table):
    media_id: long, kind: string ('image'|'audio'|'video'),
    payload: binary, meta: struct<width:int, height:int, sample_rate:int,
    n_frames:int, codec:string>

Scale notes: payloads never ride a shuffle — every op here is a map stage
(mapInPandas) pipelined onto the scan; down-stream joins use media_id + the
extracted (small) feature vectors. Batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so a partition of large blobs
streams through the Python worker instead of materializing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)


def _not_implemented_decoder(payload: bytes, meta) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding needs an image/audio codec library that is not "
        "available in this container; pass decoder= a callable "
        "(payload: bytes, meta: Row) -> np.ndarray"
    )


def fake_image_decoder(payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decoder: expands the payload bytes into a
    (height, width) float image by tiling — stable across runs/partitions,
    so tests can assert exact feature values."""
    h = int(meta["height"] or 8)
    w = int(meta["width"] or 8)
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(raw) == 0:
        raw = np.zeros(1)
    return np.resize(raw, (h, w)) / 255.0


def fake_audio_decoder(payload: bytes, meta) -> np.ndarray:
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(raw) == 0:
        raw = np.zeros(1)
    return (raw - 127.5) / 127.5


def decode_features(
    df: DataFrame,
    extract: Callable[[np.ndarray], np.ndarray],
    decoder: Callable[[bytes, object], np.ndarray] = _not_implemented_decoder,
    payload_col: str = "payload",
    meta_col: str = "meta",
    out_col: str = "features",
) -> DataFrame:
    """decode(payload, meta) → extract(array) → features per row.

    Pure map stage; payload and meta pass through unchanged.
    """
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )
    cols = [f.name for f in df.schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                arr = decoder(bytes(payload), meta)
                feats.append(np.asarray(extract(arr), dtype=np.float64))
            out = pdf[cols].copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(gen, schema)


def image_stats_extractor(img: np.ndarray) -> np.ndarray:
    """Example feature head: (mean, std, min, max, aspect, edge-energy)."""
    gy, gx = np.gradient(img.astype(np.float64))
    return np.array(
        [
            img.mean(),
            img.std(),
            img.min(),
            img.max(),
            img.shape[1] / img.shape[0],
            float(np.mean(gx * gx + gy * gy)),
        ]
    )


def resize_image(
    df: DataFrame,
    height: int,
    width: int,
    decoder: Callable = _not_implemented_decoder,
    payload_col: str = "payload",
    meta_col: str = "meta",
    out_col: str = "pixels",
) -> DataFrame:
    """Decode + nearest-neighbor resize to (height, width), emitted as a
    flat array<double> (row-major). Deterministic (no interpolation libs)."""
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )
    cols = [f.name for f in df.schema.fields]

    def gen(batches):
        for pdf in batches:
            out_px = []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                img = decoder(bytes(payload), meta)
                ri = (np.arange(height) * img.shape[0] / height).astype(int)
                ci = (np.arange(width) * img.shape[1] / width).astype(int)
                out_px.append(img[np.ix_(ri, ci)].ravel())
            out = pdf[cols].copy()
            out[out_col] = out_px
            yield out

    return df.mapInPandas(gen, schema)


def sample_frames(
    df: DataFrame,
    every_n: int,
    decoder: Callable = _not_implemented_decoder,
    payload_col: str = "payload",
    meta_col: str = "meta",
) -> DataFrame:
    """Video frame sampling: one OUTPUT ROW per kept frame (UDTF-shaped
    mapInPandas — variable-length output), carrying (media_id, frame_no,
    frame: array<double>)."""
    schema = StructType(
        [
            df.schema["media_id"],
            StructField("frame_no", LongType()),
            StructField("frame", ArrayType(DoubleType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf[payload_col], pdf[meta_col]
            ):
                video = decoder(bytes(payload), meta)  # (n_frames, h*w)
                for fno in range(0, video.shape[0], every_n):
                    ids.append(mid)
                    frame_nos.append(fno)
                    frames.append(video[fno].astype(np.float64))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame": frames}
            )

    return df.mapInPandas(gen, schema)
