"""Streaming HyperLogLog — count-distinct over an unbounded feed with
fixed state.

The register table (operators/sketches.py::hll_registers) is
mergeable by max(), so it IS a valid streaming aggregate: m rows of
state per group regardless of how many events or distinct keys flow
past, where a streaming dropDuplicates-then-count would buffer every
key. The sketch-over-stream sibling of streaming/cms_stream.py —
frequency there, cardinality here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import _hll_cols, hll_estimate
from .events_stream import _event_stream
from .runner import run_stream


def streaming_hll_distinct_users(
    spark: SparkSession,
    events_path: str,
    m: int = 128,
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Distinct users per event_type from a STREAMED HyperLogLog: the
    per-(type, bucket) max-rho register table is maintained by a
    Structured Streaming aggregation (complete mode, availableNow on
    the finite fixture — the identical plan runs unbounded with the
    same m-rows-per-group state), then the raw estimate is computed
    in batch next to the exact distinct count. Registers replay
    exactly in any engine (md5 hex string/integer decode), so the
    estimate — collisions, bias and all — carries a FULL value
    oracle.

    Returns (event_type, exact_distinct, n_zero, hll_est).
    """
    stream = _event_stream(spark, events_path)
    bucket, rho = _hll_cols("user_id", m)
    agg = (
        stream.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    registers = run_stream(
        spark, agg, "complete", sink=sink, sink_dir=sink_dir
    )
    est = hll_estimate(registers, ["event_type"], m=m)
    exact = (
        spark.read.parquet(events_path)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return exact.join(est, "event_type").select(
        "event_type", "exact_distinct", "n_zero", "hll_est"
    )
