"""Streaming query catalog (SURVEY.md §2.10).

The reference has no true streaming; its ES producer/consumer file
handoff maps to a file-source Structured Streaming query with
trigger(availableNow) — see streaming/events_stream.py.
"""

from __future__ import annotations

from ..streaming.events_stream import windowed_event_counts
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
               sum(CAST(value AS DECIMAL(18,4))) AS total_value
        FROM events GROUP BY 1, 2
    """,
))
