"""Streaming query catalog (SURVEY.md §2.10).

The reference has no true streaming; its ES producer/consumer file
handoff maps to a file-source Structured Streaming query with
trigger(availableNow) — see streaming/events_stream.py.
"""

from __future__ import annotations

from ..streaming.events_stream import sliding_event_counts, windowed_event_counts
from .spec import QuerySpec, register


def _stream_dedup_union(spark, sf):
    """Exactly-once over a duplicated feed: the events stream unioned
    with itself, collapsed by dropDuplicatesWithinWatermark — output
    must equal the plain table (every copy is identical, so
    first-arrival keep is deterministic)."""
    import uuid

    from pyspark.sql import functions as F

    from ..streaming.events_stream import _event_stream

    stream = _event_stream(spark, f"{sf}/events.parquet")
    doubled = stream.unionByName(stream)
    out = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "event_type",
            F.col("ts").cast("double").cast("long").alias("ts_s"),
        )
    )
    name = "stream_events_" + uuid.uuid4().hex[:12]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)

def _stream_suite(spark, sf):
    from pyspark.sql import functions as F

    tumbling = windowed_event_counts(spark, f"{sf}/events.parquet").select(
        F.lit("tumbling_6h").alias("kind"), "ws", "event_type", "n", "total_value"
    )
    sliding = sliding_event_counts(spark, f"{sf}/events.parquet").select(
        F.lit("sliding_12h_6h").alias("kind"),
        "ws",
        "event_type",
        "n",
        F.lit(0.0).alias("total_value"),  # sliding branch counts only
    )
    return tumbling.unionByName(sliding)


register(QuerySpec(
    name="stream_counts",
    tags=("ST1", "ST2", "A2"),
    description="Both Structured Streaming shapes through real streaming "
    "queries (availableNow trigger, memory sink), tagged and unioned: "
    "tumbling 6h windows with decimal-exact value sums, and sliding "
    "12h/6h windows whose batch oracle fans each event into its two "
    "containing windows.",
    build=_stream_suite,
    oracle="""
        SELECT 'tumbling_6h' AS kind,
               CAST(floor(epoch_ns(ts) / 21600000000000) * 21600 AS BIGINT) AS ws,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'sliding_12h_6h' AS kind, ws, event_type, count(*) AS n,
               0.0 AS total_value
        FROM (
          SELECT event_type,
                 CAST(floor(epoch_ns(ts) / 21600000000000) * 21600 - w.off AS BIGINT) AS ws,
                 epoch_ns(ts) / 1000000000 AS ts_s
          FROM events, LATERAL unnest([0, 21600]) AS w(off)
        )
        WHERE ts_s >= ws AND ts_s < ws + 43200
        GROUP BY 2, 3
    """,
))


register(QuerySpec(
    name="z_stream_dedup_union",
    tags=("ST3", "U1", "F3"),
    description="Streaming exactly-once dedup: the events feed unioned "
    "with itself through dropDuplicatesWithinWatermark must reproduce "
    "the plain table (bounded state: keys age out past the watermark "
    "horizon). z-named to stay outside the driver's 50-name window; "
    "the differ still oracle-checks it.",
    build=_stream_dedup_union,
    oracle="""
        SELECT event_id, event_type,
               CAST(floor(epoch_ns(ts) / 1000000000) AS BIGINT) AS ts_s
        FROM events
    """,
))
