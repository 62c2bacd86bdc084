"""Composite join operators Spark lacks natively.

``as_of_join`` re-expresses the reference's temporal "map each event to
the latest frozen release <= ts" lookup (reference
interpro/oracle/entries.py:275-290, bisect_left over sorted freeze
dates) as a union-and-window plan: one shuffle on (keys, ts), no range
explosion, no driver-side bisect. This is the scalable form — a naive
range join would be O(|L| x |R|) per key.

``interval_overlap_join`` is the reference's location-overlap theta
join (interpro/xrefs/entries.py:55-101, interpro/utils.py:21-41)
as an equi-join on coarse buckets + residual predicate, so Catalyst
executes a shuffled hash join instead of a broadcast-nested-loop
cross product. Bucketing bounds the candidate pairs; the residual
``a.start <= b.end AND b.start <= a.end`` keeps exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` of the matching right
    row within the same ``on`` keys: with ``direction="backward"`` the
    latest right row with ``right_ts <= left_ts``; with ``"forward"``
    the earliest right row with ``right_ts >= left_ts`` (the
    reference's release-freeze attribution — bisect_left over sorted
    freeze dates, interpro/oracle/entries.py:275-290; left rows after
    the last freeze get nulls, callers drop them as the reference
    does). Exact timestamp matches count in both directions.

    Implementation: tag and union both sides, sort each key group by
    ts, then last/first(value, ignorenulls) over a one-sided frame;
    keep only left rows. One shuffle, linear work, skew-safe under AQE.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    val_out = [c + suffix for c in value_cols]
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(0))
    for c, out in zip(value_cols, val_out):
        lhs = lhs.withColumn(out, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(out) for c, out in zip(value_cols, val_out)],
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # at equal ts the right row must fall inside the left row's frame:
    # backward frame is (start..current] -> right first; forward frame
    # is [current..end) -> right after left
    side_order = F.col("__side").desc() if backward else F.col("__side").asc()
    order = [F.col("__ts").asc(), side_order]
    if tiebreak:
        # deterministic pick among right rows sharing a timestamp
        tb = F.col(tiebreak + suffix if tiebreak in value_cols else tiebreak)
        order.append(tb.asc_nulls_first() if backward else tb.desc_nulls_last())
    w = Window.partitionBy(*on).orderBy(*order)
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)
    filled = unioned.select(
        *[c for c in lhs.columns if c not in val_out],
        *[pick(c).over(w).alias(c) for c in val_out],
    )
    return filled.filter(F.col("__side") == 0).drop("__ts", "__side")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int | None = None,
    extra_pred: Column | None = None,
) -> DataFrame:
    """Join rows whose [start, end] intervals overlap within ``on`` keys.

    With ``bucket_width`` set, each side is exploded onto the coarse
    grid cells its interval covers, the join becomes an equi-join on
    (keys, cell) + residual overlap predicate, and duplicate candidate
    pairs are removed by only accepting the first shared cell. Without
    it, falls back to the plain theta join (fine when ``on`` keys are
    selective, as in the reference's per-protein overlap checks).
    """
    ls, le_, rs, re_ = (F.col(c) for c in (left_start, left_end, right_start, right_end))
    overlap = (ls <= re_) & (rs <= le_)
    if extra_pred is not None:
        overlap = overlap & extra_pred
    if bucket_width is None:
        return left.join(right, on=on).filter(overlap)

    def cells(start: str, end: str) -> Column:
        return F.sequence(
            (F.col(start) / bucket_width).cast("long"),
            (F.col(end) / bucket_width).cast("long"),
        )

    lhs = left.withColumn("__cell", F.explode(cells(left_start, left_end)))
    rhs = right.withColumn("__cell", F.explode(cells(right_start, right_end)))
    # accept a candidate pair only in the first grid cell both cover,
    # so each overlapping pair is emitted exactly once
    first_shared = F.greatest(
        (ls / bucket_width).cast("long"), (rs / bucket_width).cast("long")
    ) == F.col("__cell")
    return (
        lhs.join(rhs, on=on + ["__cell"])
        .filter(overlap & first_shared)
        .drop("__cell")
    )
