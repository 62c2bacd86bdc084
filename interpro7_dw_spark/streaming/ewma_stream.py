"""Streaming EWMA — the stateful-continuous habitat of
``operators/timeseries.py::ewma``.

The affine recurrence that lets the batch operator compose per
time-chunk (``s_out = A*s_in + B``) is exactly what makes the score
STREAMABLE with one double of state per key: each micro-batch is a
chunk, the carried state is the composed ``s_in``, and the per-event
outputs replay the elementwise fold from it. The arithmetic is
op-for-op the batch plan's (same left folds, same multiply-add order,
same shortest-repr HALF_UP 6-place round), so when micro-batch
boundaries align with the batch operator's chunk boundaries the
streamed doubles equal the batch ones bit-for-bit
(tests/test_streaming.py pins it; the z_stream_ewma spec pins it
against the shared DuckDB oracle).

Ordering contract: event time must be non-decreasing per key ACROSS
micro-batches (the file-per-time-chunk discipline — a feed that can
deliver late events needs a watermark buffer upstream, same contract
as every sequential fold). The kernel fails fast on a violation
instead of silently folding out of order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key bigint, ts_ns bigint, event_id bigint, ewma double"
STATE_SCHEMA = "s double, last_tsn bigint, last_id bigint"


def ewma_stream(
    events: DataFrame,
    alpha_ppm: int = 200_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """``events``: streaming DataFrame carrying (key, ts, id, value).
    Emits one row per event with its running EWMA (zero-initialized,
    Kingma & Ba biased first moment — the batch operator's
    convention). Null values are excluded, matching batch.

    Scale: state is three scalars per key (the composed ``s`` plus
    the ordering guard), emission is map-side per micro-batch — no
    shuffle beyond the per-key grouping, no history kept.
    """
    a = alpha_ppm / 1e6
    om = 1.0 - a

    def update(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        (k,) = key
        if state.exists:
            s, last_tsn, last_id = state.get
        else:
            s, last_tsn, last_id = 0.0, None, None
        rows = sorted(
            (int(t), int(i), float(x))
            for pdf in pdfs
            for t, i, x in zip(pdf["tsn"], pdf["id"], pdf["x"])
        )
        if rows and last_tsn is not None and (rows[0][0], rows[0][1]) < (
            last_tsn,
            last_id,
        ):
            raise ValueError(
                f"out-of-order micro-batch for key {k}: event "
                f"({rows[0][0]}, {rows[0][1]}) after state watermark "
                f"({last_tsn}, {last_id}) — the EWMA fold requires "
                "non-decreasing event time per key across batches"
            )
        if rows:
            # the batch plan's arithmetic, op for op: elementwise
            # replay from the carried s_in for the outputs; the A/B
            # affine summary (NOT the replay accumulator) for the
            # carried state — identical to phase 2/3 of the batch ewma
            out = []
            acc = s
            big_a, big_b = 1.0, 0.0
            for tsn, i, x in rows:
                acc = a * x + om * acc
                big_a = big_a * om
                big_b = a * x + om * big_b
                rounded = float(
                    Decimal(repr(acc)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                )
                out.append((k, tsn, i, rounded))
            s = big_a * s + big_b
            state.update((s, rows[-1][0], rows[-1][1]))
            yield pd.DataFrame(
                out, columns=["key", "ts_ns", "event_id", "ewma"]
            )

    prepared = events.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("tsn"),
        F.col(id_col).cast("long").alias("id"),
        F.col(value_col).cast("double").alias("x"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
