"""Stream-stream joins (SURVEY.md §2.10).

The reference joins its feeds only in batch (every xref mart is a
static join over exported stores, e.g. `interpro7dw/interpro/oracle/
matches.py` re-reads both sides per release). The streaming-native
equivalent is Structured Streaming's watermarked stream-stream join:
both inputs are unbounded, each side buffers rows in the state store,
and an EVENT-TIME RANGE condition plus watermarks bound how long a
row can wait for its match — so state is evicted, not grown forever.

At 100 TB feed scale this is the attribution-join shape (impression
joined to the actions it caused within a horizon): the state store
holds only `watermark + range` worth of each side per key, and the
symmetric hash join is partitioned by the equi-key — no executor ever
sees a whole feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events_stream import _event_stream
from .runner import run_stream


def attribution_join_stream(
    spark: SparkSession,
    events_path: str,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join: the events feed split
    into an impression stream (even event ids) and an action stream
    (odd event ids), joined per user on an event-time range — an
    action attributes to every impression at most ``horizon_minutes``
    before it. Both sides carry watermarks and the join condition
    carries the time bound, so Spark derives a state-eviction policy
    for BOTH buffers (a row is dropped once no future match can
    arrive). Inner join: matches emit as soon as both sides have
    arrived, deterministically — the emitted set equals the batch
    join, which is the oracle.

    Returns (user_id, impression_id, action_id, lag_us).
    """
    imps = (
        _event_stream(spark, events_path, max_files_per_trigger)
        .filter(F.col("event_id") % 2 == 0)
        .select(
            "user_id",
            F.col("event_id").alias("impression_id"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", watermark)
    )
    acts = (
        _event_stream(spark, events_path, max_files_per_trigger)
        .filter(F.col("event_id") % 2 == 1)
        .select(
            F.col("user_id").alias("act_user"),
            F.col("event_id").alias("action_id"),
            F.col("ts").alias("act_ts"),
        )
        .withWatermark("act_ts", watermark)
    )
    joined = imps.join(
        acts,
        F.expr(
            "user_id = act_user AND act_ts >= imp_ts "
            f"AND act_ts <= imp_ts + interval {int(horizon_minutes)} minutes"
        ),
        "inner",
    )
    out = joined.select(
        "user_id",
        "impression_id",
        "action_id",
        (F.unix_micros("act_ts") - F.unix_micros("imp_ts")).alias("lag_us"),
    )
    return run_stream(spark, out, "append", sink=sink, sink_dir=sink_dir)


def enriched_event_counts(
    spark: SparkSession,
    events_path: str,
    dim: DataFrame,
    dim_key: str = "c_custkey",
    group_cols: tuple[str, str] = ("c_nationkey", "c_mktsegment"),
) -> DataFrame:
    """STREAM-STATIC join + streaming aggregation: the events feed
    enriched against a broadcast dimension (the static side is
    re-resolved per micro-batch — Spark's stream-static join never
    buffers the stream for it, state is only the downstream
    aggregate's). This is the streaming twin of every mart's
    broadcast-dim enrichment (domain/pipeline.py): at 100 TB feed
    scale the dim rides as a broadcast per batch and the only shuffle
    is the group-key aggregate.

    Returns (group_cols..., n, total_value) with a decimal-exact sum.
    """
    stream = _event_stream(spark, events_path)
    joined = stream.join(
        F.broadcast(dim), stream["user_id"] == dim[dim_key], "inner"
    )
    out = joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("total_value"),
    )
    return run_stream(spark, out, "complete")
