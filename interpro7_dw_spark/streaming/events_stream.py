"""Structured Streaming equivalents of the reference's file-handoff
producer/consumer stage (interpro/elastic/index.py:179-208: new .dat
files discovered while being produced, sentinel .done ends the loop).

In Spark that protocol IS the file streaming source: a directory of
files consumed with trigger(availableNow=True) gives the same
"process everything that has arrived, then stop" semantics, with
exactly-once bookkeeping from the checkpoint instead of sentinels.

``windowed_event_counts`` runs a tumbling-window aggregation over the
events table through a real streaming query (memory sink, complete
mode) and returns the final result as a DataFrame — so the batch
oracle can verify it. Watermark-based append mode is the production
path on an unbounded source; complete mode keeps the finite-source
result deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .runner import run_stream


def _event_stream(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
):
    # events.ts arrives either as epoch-nanos LONG (TIMESTAMP(NANOS)
    # parquet read under the legacy flag) or as timestamp_ntz
    # (TIMESTAMP(MICROS) parquet); normalize to a proper event-time
    # timestamp for windowing. The file streaming source wants a
    # directory — point it at the sf dir with a glob filter selecting
    # just the events table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_path)
    directory, _, filename = events_path.rpartition("/")
    reader = spark.readStream.schema(batch.schema).option(
        "pathGlobFilter", filename
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(directory)
    # The cast branch is decided once from an eager batch read; the
    # stream assumes the parquet physical ts type is fixed for the
    # lifetime of the query (true for this finite fixture source —
    # files appended later must match the schema captured at start).
    if dict(batch.dtypes).get("ts") == "bigint":
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # naive timestamp interpreted as UTC — same convention as the batch
    # catalog (sources/catalog.py normalize_event_ts). Go through
    # tz-free NTZ wall-clock arithmetic + timestamp_micros so the
    # resulting event-time instants are identical under ANY session
    # timezone (the driver runs this under its own session).
    return stream.withColumn(
        "ts",
        F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        ),
    )


def _run_to_table(
    spark: SparkSession, agg, sink: str = "memory", sink_dir: str | None = None
) -> DataFrame:
    return run_stream(spark, agg, "complete", sink=sink, sink_dir=sink_dir)


def sliding_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "12 hours",
    slide: str = "6 hours",
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Sliding event-time windows: each event lands in
    window/slide overlapping windows."""
    stream = _event_stream(spark, events_path)
    agg = (
        stream.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").cast("double").cast("long").alias("ws"),
            "event_type",
            "n",
        )
    )
    return _run_to_table(spark, agg, sink=sink, sink_dir=sink_dir)


def watermarked_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "6 hours",
    late: str = "1 hour",
) -> DataFrame:
    """Append-mode tumbling windows with a late-data watermark — the
    production shape for an unbounded source: state for a window is
    dropped (and the row emitted exactly once) when the watermark
    passes ``window end + late``.

    On a finite source run with availableNow, windows still open at
    the final watermark (those within ``late`` of the max event time)
    are retained in state, NOT emitted — asserted in
    tests/test_streaming.py; the complete-mode variant remains the
    deterministic batch-comparable query.
    """
    stream = _event_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", late)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").cast("double").cast("long").alias("ws"),
            F.col("window.end").cast("double").cast("long").alias("we"),
            "event_type",
            "n",
        )
    )
    return run_stream(spark, agg, "append")


def dedup_event_stream(
    spark: SparkSession,
    events_path: str,
    keys: list[str] | None = None,
    late: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once dedup: dropDuplicatesWithinWatermark
    keeps one row per key while the key's event time is within the
    watermark horizon, then ages the key out of state — bounded state
    on an unbounded feed (plain dropDuplicates would grow forever).
    """
    stream = _event_stream(spark, events_path)
    deduped = stream.withWatermark("ts", late).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
    out = deduped.select(
        "event_id", "event_type", F.col("ts").cast("double").cast("long").alias("ts_s")
    )
    return run_stream(spark, out, "append")


def windowed_event_counts(
    spark: SparkSession, events_path: str, window: str = "6 hours",
    sink: str = "memory", sink_dir: str | None = None,
) -> DataFrame:
    stream = _event_stream(spark, events_path)
    agg = (
        stream.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("total_value"),
        )
        .select(
            F.col("window.start").cast("double").cast("long").alias("ws"),
            "event_type",
            "n",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )
    return _run_to_table(spark, agg, sink=sink, sink_dir=sink_dir)


def streaming_ohlc_bars(
    spark: SparkSession,
    events_path: str,
    window: str = "1 day",
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Daily OHLC candlesticks maintained AS A STREAMING AGGREGATE
    (complete mode, availableNow on the finite fixture; unbounded in
    production with state bounded by keys x open windows): the
    min_by/max_by open/close picks and high/low/count are all
    mergeable aggregates, so Structured Streaming maintains each
    (key, window) cell incrementally — the streaming twin of
    operators/timeseries.py::ohlc_bars, same output contract.

    Same-instant ties break on the unique event id, so replays and
    out-of-order arrival cannot change open/close."""
    stream = _event_stream(spark, events_path)
    pos = F.struct(F.col("ts"), F.col("event_id"))
    agg = (
        stream.groupBy(F.window("ts", window), "user_id")
        .agg(
            F.min_by("value", pos).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", pos).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.col("user_id").alias("key"),
            F.col("window.start").cast("double").cast("long").alias("bucket_start_s"),
            "open", "high", "low", "close", "n_events",
        )
    )
    return _run_to_table(spark, agg, sink=sink, sink_dir=sink_dir)


def streaming_session_windows(
    spark: SparkSession,
    events_path: str,
    gap: str = "30 minutes",
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Per-key SESSION windows maintained as a streaming aggregate
    (``F.session_window`` — dynamic-length windows that merge while
    consecutive events arrive closer than ``gap``): the streaming twin
    of the batch gaps-and-islands sessionization (sessionize_events),
    with Spark's native session-state merging instead of the
    lag()+running-sum island trick. Complete mode on the finite
    fixture keeps the result batch-comparable; in production the same
    plan runs append-mode behind a watermark, state bounded by keys x
    open sessions.

    Merge rule (oracled exactly, boundary pinned in
    tests/test_streaming.py): consecutive events merge iff their gap
    is <= ``gap`` — TOUCHING windows coalesce, so an event at exactly
    last+gap still merges (same rule as the batch sessionize_events);
    ``sess_end_us`` is last event time + gap, Spark's window.end.

    Returns (key, sess_start_us, sess_end_us, n_events, total_value).
    """
    stream = _event_stream(spark, events_path)
    agg = (
        stream.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("__sv"),
        )
        .select(
            F.col("user_id").alias("key"),
            F.unix_micros("session_window.start").alias("sess_start_us"),
            F.unix_micros("session_window.end").alias("sess_end_us"),
            "n_events",
            F.col("__sv").cast("double").alias("total_value"),
        )
    )
    return _run_to_table(spark, agg, sink=sink, sink_dir=sink_dir)


def streaming_histogram_sketch(
    spark: SparkSession,
    events_path: str,
    bins: int,
    lo: float,
    hi: float,
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """The fixed-grid histogram sketch (operators/quantiles.py::
    histogram_sketch) maintained as a STREAMING aggregate: counts per
    (key, bucket) sum cell-wise, so the same bucketing expression
    under a streaming groupBy carries at most ``bins`` rows of state
    per key at any feed length — the order-statistics sibling of the
    streamed CMS/HLL sketches. Bounds are supplied (trained on a
    reference snapshot or fixed by contract); the grid expression is
    the exact one the batch operator uses, so streamed cells equal
    batch cells."""
    stream = _event_stream(spark, events_path)
    v = F.col("value").cast("double")
    if hi > lo:
        bucket = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor(((v - F.lit(lo)) * F.lit(bins)) / F.lit(hi - lo)),
            ),
        )
    else:
        bucket = F.lit(0).cast("long")
    agg = (
        stream.filter(v.isNotNull())
        .select(F.col("event_type").alias("key"), bucket.alias("bucket"))
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return run_stream(spark, agg, "complete", sink=sink, sink_dir=sink_dir)
