"""Streaming query catalog (SURVEY.md §2.10).

The reference has no true streaming; its ES producer/consumer file
handoff maps to a file-source Structured Streaming query with
trigger(availableNow) — see streaming/events_stream.py.
"""

from __future__ import annotations

from ..streaming.events_stream import sliding_event_counts, windowed_event_counts
from .spec import QuerySpec, register

register(QuerySpec(
    name="stream_window_counts",
    tags=("ST1", "A2"),
    description="Tumbling-window event counts through a real Structured "
    "Streaming query (availableNow trigger, memory sink), verified against "
    "the equivalent batch SQL.",
    build=lambda spark, sf: windowed_event_counts(spark, f"{sf}/events.parquet"),
    oracle="""
        SELECT CAST(floor(epoch_ns(ts) / 21600000000000) * 21600 AS BIGINT) AS ws,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
))

register(QuerySpec(
    name="stream_sliding_counts",
    tags=("ST2", "A2"),
    description="Sliding event-time windows (12h window, 6h slide) through "
    "Structured Streaming; the batch oracle fans each event into its two "
    "containing windows.",
    build=lambda spark, sf: sliding_event_counts(spark, f"{sf}/events.parquet"),
    oracle="""
        WITH fan AS (
          SELECT event_type,
                 CAST(floor(epoch_ns(ts) / 21600000000000) * 21600 - w.off AS BIGINT) AS ws,
                 epoch_ns(ts) / 1000000000 AS ts_s
          FROM events, LATERAL unnest([0, 21600]) AS w(off)
        )
        SELECT ws, event_type, count(*) AS n
        FROM fan
        WHERE ts_s >= ws AND ts_s < ws + 43200
        GROUP BY 1, 2
    """,
))
