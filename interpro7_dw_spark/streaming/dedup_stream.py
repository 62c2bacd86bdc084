"""Streaming exact content-dedup — the incremental bridge to the
batch dedup family (operators/dedup.py).

A 100 TB ingest pipeline dedups as documents ARRIVE, not in one batch
pass: each document's content fingerprint (md5 of the text — same key
as ``operators/dedup.py::dedup_exact``) is checked against streaming
state and emitted at most once while the key is inside the watermark
horizon. ``dropDuplicatesWithinWatermark`` gives exactly that with
BOUNDED state: a fingerprint's state row is dropped once the
watermark passes its event time + horizon (a plain ``dropDuplicates``
on an unbounded feed would grow state forever) — so state holds at
most the distinct fingerprints seen within one horizon, regardless of
total stream length. The trade-off is the standard one: a duplicate
arriving AFTER its original aged out re-emits; size the horizon to
the feed's duplication lag.

Streamed-equals-batch contract (tests/test_streaming.py): on a finite
fixture the emitted fingerprint set equals the batch
``SELECT DISTINCT md5(text)`` — the stream_dedup_exact catalog
oracle checks the same equality at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .runner import run_stream

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _require_integral_id(schema: T.StructType, id_col: str) -> None:
    """The synthetic event time is ``timestamp_micros(id)``; a
    non-integral id would cast to null, and null-event-time rows are
    silently dropped as late by the watermarked dedup — fail fast
    instead of emitting nothing."""
    dt = schema[id_col].dataType
    if not isinstance(dt, _INTEGRAL):
        raise TypeError(
            f"dedup stream synthesizes event time from {id_col!r}, which "
            f"must be an integral column (got {dt.simpleString()}); hash "
            "string ids to a long or supply a real ingest timestamp"
        )


def dedup_content_stream(
    spark: SparkSession,
    docs_path: str,
    late: str = "1 hour",
    text_col: str = "text",
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Emit each distinct document CONTENT exactly once from a stream
    of documents. Event time is synthesized deterministically from the
    doc id (the fixture has no arrival column; a production feed uses
    its ingest timestamp) so watermark progression — and therefore
    state aging — is reproducible.

    ``sink='files'`` (with ``sink_dir``) routes the output through the
    exactly-once parquet file sink instead of the driver-side memory
    table — the production path (streaming/runner.py); the
    streamed-equals-batch test runs both and asserts equality.

    Returns the emitted fingerprints (fp string) — one row per
    distinct content within the watermark horizon.
    """
    batch = spark.read.parquet(docs_path)
    _require_integral_id(batch.schema, "doc_id")
    directory, _, filename = docs_path.rpartition("/")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", filename)
        .parquet(directory)
    )
    # offset the synthetic event time by one day: epoch-0 event time
    # equals the operator's INITIAL watermark and is discarded as late
    keyed = stream.select(
        F.md5(F.col(text_col).cast("binary")).alias("fp"),
        F.timestamp_micros(
            F.col("doc_id").cast("long") + F.lit(86_400_000_000)
        ).alias("__ts"),
    )
    out = (
        keyed.withWatermark("__ts", late)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("fp")
    )
    return run_stream(spark, out, "append", sink=sink, sink_dir=sink_dir)


def neardup_simhash_stream(
    spark: SparkSession,
    docs_path: str,
    late: str = "1 hour",
    text_col: str = "text",
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Streaming NEAR-dup suppression: emit each distinct 64-bit
    SimHash fingerprint exactly once while it is inside the watermark
    horizon — documents whose fingerprints collide (near-identical
    token sets) are suppressed as they arrive. The fingerprint is the
    map-side row-wise SimHash (operators/dedup.py::rowwise_simhash64
    — the batch operator's aggregate pipeline would be a disallowed
    chained stateful plan in streaming), so the whole query is one
    stateless projection + one watermarked dedup with state bounded
    by the distinct fingerprints in one horizon.

    Returns the emitted fingerprints (simhash long).
    """
    from ..operators.dedup import rowwise_simhash64

    batch = spark.read.parquet(docs_path)
    _require_integral_id(batch.schema, "doc_id")
    directory, _, filename = docs_path.rpartition("/")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", filename)
        .parquet(directory)
    )
    keyed = stream.select(
        rowwise_simhash64(text_col).alias("simhash"),
        F.timestamp_micros(
            F.col("doc_id").cast("long") + F.lit(86_400_000_000)
        ).alias("__ts"),
    )
    out = (
        keyed.withWatermark("__ts", late)
        .dropDuplicatesWithinWatermark(["simhash"])
        .select("simhash")
    )
    return run_stream(spark, out, "append", sink=sink, sink_dir=sink_dir)
