"""Custom stateful streaming: per-key sessionization with
applyInPandasWithState (SURVEY.md §2.10 — the reference has no true
streaming; this is the engine's forward-looking stateful operator for
unbounded event feeds).

Semantics match the batch sessionizer (plans/relational.py
``sessionize_events``): events for a user belong to one session while
gaps stay <= the timeout; a batch's close emits completed sessions and
keeps the open session in state for the next micro-batch.

The kernel is a closure (shipped by value — workers don't need this
package importable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, sess_start_us bigint, sess_end_us bigint, n_events bigint"
STATE_SCHEMA = "sess_start_us bigint, sess_end_us bigint, n_events bigint"


def sessionize_stream(events: DataFrame, gap_us: int = 1_800_000_000) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts_us long).
    Emits one row per CLOSED session (a new event further than
    ``gap_us`` from the open session's end closes it)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0

        closed = []
        ts_sorted = sorted(int(t) for pdf in pdfs for t in pdf["ts_us"])
        for t in ts_sorted:
            if start is None:
                start = end = t
                n = 1
            elif t - end <= gap_us:
                end = t
                n += 1
            else:
                closed.append((user_id, start, end, n))
                start = end = t
                n = 1
        if start is not None:
            state.update((start, end, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "sess_start_us", "sess_end_us", "n_events"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CHANGE_OUTPUT_SCHEMA = (
    "user_id bigint, ts_us bigint, event_type string, prev_type string"
)
CHANGE_STATE_SCHEMA = "last_type string, last_ts_us bigint"


def change_stream(events: DataFrame) -> DataFrame:
    """Per-key change detection over a stream — the streaming sibling
    of the batch snapshot differ (operators/cdc.py): for each user,
    emit an event only when its ``event_type`` DIFFERS from the
    previous one (first observation emits with a NULL ``prev_type``).
    The deduplicated change log is what downstream incremental sinks
    consume instead of the full feed.

    State per key is two scalars (last type + its timestamp) — bounded
    regardless of feed length; events inside a micro-batch process in
    (ts_us) order, and the carried state makes the emission sequence
    identical however the feed is micro-batched (availableNow replay
    equals a single batch).

    events: streaming DataFrame with (user_id long, ts_us long,
    event_type string).
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        last_type, last_ts = state.get if state.exists else (None, None)
        out = []
        rows = sorted(
            (
                (int(r.ts_us), str(r.event_type))
                for pdf in pdfs
                for r in pdf.itertuples()
            ),
        )
        for ts, et in rows:
            if et != last_type:
                out.append((user_id, ts, et, last_type))
                last_type = et
            last_ts = ts
        if last_type is not None:
            state.update((last_type, int(last_ts)))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "ts_us", "event_type", "prev_type"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=CHANGE_OUTPUT_SCHEMA,
        stateStructType=CHANGE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
