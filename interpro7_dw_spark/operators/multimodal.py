"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio codec libraries (Pillow / pyav), so
instead of hiding the kernels behind NotImplementedError we define a
tiny deterministic raster container and implement the *full* kernel
stack against it in pure numpy:

- ``FRI0`` raster:  b"FRI0" | width:u16be | height:u16be | w*h u8 pixels
- ``FVI0`` video:   b"FVI0" | width:u16be | height:u16be | n_frames:u16be
                    | n_frames rasters of w*h u8 pixels

``make_raster_payload`` / ``make_video_payload`` synthesize payloads
deterministically from document text (md5 counter stream), so every
downstream kernel — header parse, pixel statistics, bilinear resize,
frame sampling — is a *real* binary decode + numpy compute, not a hash
stand-in. Swapping in JPEG/H.264 on a cluster with codec libs only
replaces the ``_parse_raster`` / ``_parse_video`` leaf functions; the
Spark-side plumbing (schemas, mapInPandas batch iteration, partition
sizing) is identical.

Batching notes: mapInPandas streams Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest (default 10k)
when payloads are MBs — for 100 TB of images you want ``repartition``
so each task holds O(100) payloads, not O(100k).

Reference parity: the reference pipeline has no image path; this family
is part of the training-data-pipeline surface required by the brief.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RASTER_MAGIC = b"FRI0"
VIDEO_MAGIC = b"FVI0"

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])

RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
])


# ---------------------------------------------------------------- codec


def _det_bytes(seed: bytes, n: int) -> bytes:
    """Deterministic byte stream: md5(seed || counter) blocks."""
    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.md5(seed + ctr.to_bytes(4, "big")).digest()
        ctr += 1
    return bytes(out[:n])


def encode_raster(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape
    return RASTER_MAGIC + struct.pack(">HH", w, h) + pixels.astype(np.uint8).tobytes()


def _parse_raster(payload: bytes) -> np.ndarray:
    if payload[:4] != RASTER_MAGIC:
        raise ValueError("not an FRI0 raster payload")
    w, h = struct.unpack(">HH", payload[4:8])
    return np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8).reshape(h, w)


def encode_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return VIDEO_MAGIC + struct.pack(">HHH", w, h, n) + frames.astype(np.uint8).tobytes()


def _parse_video(payload: bytes) -> np.ndarray:
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not an FVI0 video payload")
    w, h, n = struct.unpack(">HHH", payload[4:10])
    return np.frombuffer(payload, dtype=np.uint8, count=n * w * h, offset=10).reshape(n, h, w)


def _bilinear_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Edge-clamped bilinear resample at pixel centers (the common
    align_corners=False convention, matching PIL/torch defaults)."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    img = img.astype(np.float64)
    top = img[y0][:, x0] * (1.0 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1.0 - wx) + img[y1][:, x1] * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------- payload makers


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary media column + typed metadata, JVM-side (the cheap
    path when payloads already sit in a parquet binary column)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
    )


def make_raster_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic FRI0 raster per document (8..32 px per
    side, pixels from the md5 counter stream of the text)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                seed = hashlib.md5(str(text).encode("utf-8")).digest()
                w = 8 + seed[0] % 25
                h = 8 + seed[1] % 25
                px = np.frombuffer(_det_bytes(seed, w * h), dtype=np.uint8)
                payloads.append(encode_raster(px.reshape(h, w)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
                "media_type": "image/fri0",
                "n_bytes": pd.Series([len(p) for p in payloads], dtype="int32"),
            })

    return docs.select("doc_id", text_col).mapInPandas(gen, MEDIA_SCHEMA)


def make_video_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic FVI0 clip per document (4..12 frames
    of an 8..16 px square raster)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                seed = hashlib.md5(str(text).encode("utf-8")).digest()
                side = 8 + seed[0] % 9
                n = 4 + seed[2] % 9
                px = np.frombuffer(_det_bytes(seed, n * side * side), dtype=np.uint8)
                payloads.append(encode_video(px.reshape(n, side, side)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
                "media_type": "video/fvi0",
                "n_bytes": pd.Series([len(p) for p in payloads], dtype="int32"),
            })

    return docs.select("doc_id", text_col).mapInPandas(gen, MEDIA_SCHEMA)


# -------------------------------------------------------------- kernels


def decode_image(media: DataFrame) -> DataFrame:
    """mapInPandas decode: FRI0 payload -> typed image metadata with
    exact pixel statistics (header parse + numpy mean, no hashing)."""
    from ..util import ensure_pyfiles

    ensure_pyfiles(media.sparkSession)
    parse = _parse_raster

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [parse(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"].astype("int32"),
                "width": pd.Series([i.shape[1] for i in imgs], dtype="int32"),
                "height": pd.Series([i.shape[0] for i in imgs], dtype="int32"),
                "mean_luma": [float(i.mean()) for i in imgs],
            })

    return media.mapInPandas(decode, IMAGE_META_SCHEMA)


def resize_image(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """mapInPandas bilinear resize: FRI0 -> FRI0 at (out_w, out_h).

    Pure-numpy edge-clamped bilinear at pixel centers; re-encodes the
    resized raster so downstream kernels can chain on the payload.
    """
    from ..util import ensure_pyfiles

    ensure_pyfiles(media.sparkSession)
    parse, resize, encode = _parse_raster, _bilinear_resize, encode_raster

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [resize(parse(bytes(p)), out_w, out_h) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [encode(o) for o in outs],
                "width": pd.Series([out_w] * len(outs), dtype="int32"),
                "height": pd.Series([out_h] * len(outs), dtype="int32"),
                "mean_luma": [float(o.mean()) for o in outs],
            })

    return media.mapInPandas(kernel, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """mapInPandas frame sampling: FVI0 -> one row per k-th frame.

    Row-expanding kernel (one input row -> ceil(n_frames / k) output
    rows) — the batch shape a real pyav/ffmpeg sampler would have.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    from ..util import ensure_pyfiles

    ensure_pyfiles(media.sparkSession)
    parse = _parse_video

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, lumas = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                frames = parse(bytes(p))
                n = frames.shape[0]
                for i in range(0, n, every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n)
                    lumas.append(float(frames[i].mean()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "n_frames": pd.Series(totals, dtype="int32"),
                "mean_luma": lumas,
            })

    return media.mapInPandas(kernel, FRAME_SCHEMA)
