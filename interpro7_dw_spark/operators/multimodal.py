"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the decode kernels are
STUBS — ``decode_image_stub`` produces a deterministic fake (derived
from the md5 of the payload) behind the same mapInPandas signature a
real decoder (Pillow / torchaudio / pyav) would use. The Spark-side
plumbing — schemas, batch iteration, partition sizing — is real and
tested; swap `_fake_decode` for a real kernel on a cluster with the
libs installed.

Batching notes: mapInPandas streams Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest (default 10k)
when payloads are MBs — for 100 TB of images you want
``repartition`` so each task holds O(100) payloads, not O(100k).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a corpus with a binary media column: payload bytes +
    typed metadata (real pipelines read these from object storage)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder.

    A real implementation would be:
        from PIL import Image; img = Image.open(io.BytesIO(payload))
        return img.width, img.height, luma(img)
    """
    h = hashlib.md5(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    mean_luma = h[2] / 255.0
    return width, height, mean_luma


def decode_image_stub(media: DataFrame) -> DataFrame:
    """mapInPandas decode: binary payload -> typed image metadata.

    The package is shipped to Python workers first (util.ensure_pyfiles)
    so the kernel's by-reference helpers resolve there.
    """
    from ..util import ensure_pyfiles

    ensure_pyfiles(media.sparkSession)
    fake_decode = _fake_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"].astype("int32"),
                "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                "mean_luma": [d[2] for d in decoded],
            })

    return media.mapInPandas(decode, IMAGE_META_SCHEMA)


def resize_stub(*_args, **_kwargs):
    raise NotImplementedError(
        "image resize requires an image library not present in this "
        "container; plug a Pillow-based kernel into decode_image_stub's "
        "mapInPandas shape"
    )


def frame_sample_stub(*_args, **_kwargs):
    raise NotImplementedError(
        "video frame sampling requires pyav/ffmpeg; use the same "
        "mapInPandas pattern with one output row per sampled frame"
    )
