"""Continuous incremental view maintenance — the streaming habitat of
``operators/cdc.py::ivm_apply_group_agg``.

A production mart is not rebuilt nightly; it is FOLDED FORWARD as the
changelog arrives. Structured Streaming's ``foreachBatch`` is the
idiomatic home for that: each micro-batch of both-images change rows
(the :func:`..operators.cdc.snapshot_delta_images` shape) is merged
into the current materialized aggregate with the retract/add rule and
written as a NEW VERSION directory — the reader always sees a
complete, consistent snapshot (version directories are atomic at the
``_SUCCESS`` marker; no reader ever observes a half-merged mart), and
``foreachBatch`` + the checkpoint give exactly-once application per
epoch.

IVM contributions are additive, so ANY partitioning of the changelog
into micro-batches converges to the same mart — the streamed result
equals the batch re-aggregation of the final snapshot
(tests/test_streaming.py pins it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import ivm_apply_group_agg


def _latest_version(state_dir: str) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    vs = [
        int(p[1:])
        for p in os.listdir(state_dir)
        if p.startswith("v")
        and os.path.exists(os.path.join(state_dir, p, "_SUCCESS"))
    ]
    return max(vs) if vs else None


def _empty_mart(
    batch: DataFrame, group_col: str, n_col: str, total_col: str
) -> DataFrame:
    return (
        batch.select(F.col(f"new_{group_col}").alias(group_col))
        .limit(0)
        .withColumn(n_col, F.lit(0).cast("long"))
        .withColumn(total_col, F.lit(0).cast("decimal(18,4)"))
    )


def maintain_group_agg_stream(
    spark: SparkSession,
    changes: DataFrame,
    state_dir: str,
    group_col: str,
    value_col: str,
    n_col: str = "n_rows",
    total_col: str = "total",
) -> DataFrame:
    """Run a STREAM of both-images change rows through per-micro-batch
    IVM merges, materializing each epoch as ``state_dir/v<epoch>``.
    ``changes`` is a streaming DataFrame in the
    ``snapshot_delta_images`` shape. Runs with
    ``trigger(availableNow)`` to drain the available changelog, then
    returns the latest mart version as a DataFrame.

    Scale: each epoch costs |micro-batch delta| + touched groups (the
    IVM contract) plus a mart rewrite; at 100 TB the mart is group-
    cardinality-sized (orders of magnitude below the facts), and the
    versioned layout doubles as time travel / reader isolation.
    """

    def step(batch: DataFrame, _epoch: int) -> None:
        # versions are monotonically-next rather than epoch-numbered so
        # a pre-seeded v0 (an existing batch-built mart) chains in; a
        # crashed half-write is invisible (_SUCCESS gate) and the epoch
        # retry recomputes from the same parent version
        prev = _latest_version(state_dir)
        if prev is None:
            mart = _empty_mart(batch, group_col, n_col, total_col)
        else:
            mart = spark.read.parquet(f"{state_dir}/v{prev}")
        out = ivm_apply_group_agg(
            mart, batch, group_col, value_col, n_col=n_col, total_col=total_col
        )
        nxt = (prev if prev is not None else -1) + 1
        out.write.mode("overwrite").parquet(f"{state_dir}/v{nxt}")

    q = (
        changes.writeStream.foreachBatch(step)
        .option("checkpointLocation", state_dir + "_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = _latest_version(state_dir)
    if latest is None:
        raise RuntimeError("no change batches arrived; mart never materialized")
    return spark.read.parquet(f"{state_dir}/v{latest}")
