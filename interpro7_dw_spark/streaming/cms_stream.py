"""Streaming count-min sketch — frequency estimation over an
unbounded feed with fixed state.

The batch CMS (operators/sketches.py) is mergeable by construction:
per-partition sketches sum cell-wise. The SAME property makes it a
streaming aggregate — ``groupBy(row, bucket).count()`` over the
stream IS the sketch, maintained incrementally with at most
``depth * width`` state rows regardless of how many events or
distinct keys flow past (where a per-key streaming count would grow
state without bound). This is the standard sketch-over-stream shape
(heavy hitters on an unbounded feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_estimate
from .events_stream import _event_stream
from .runner import run_stream


def streaming_cms_heavy_users(
    spark: SparkSession,
    events_path: str,
    depth: int = 3,
    width: int = 32,
    threshold: int = 30,
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Heavy-hitter users from a STREAMED count-min sketch: the
    counter table is maintained by a Structured Streaming aggregation
    (complete mode, availableNow on the finite fixture — the identical
    plan runs unbounded in production with the same bounded state),
    then probed in batch for every user whose exact count clears
    ``threshold``. Estimates carry the one-sided CMS guarantee:
    ``cms_est >= exact_n`` always, collisions replayable by any
    engine (md5 bucket arithmetic).

    Returns (user_id, exact_n, cms_est, overestimate).
    """
    stream = _event_stream(spark, events_path)
    rows = [
        F.struct(
            F.lit(r).alias("r"),
            F.expr(
                "CAST(conv(substring(md5(CAST(concat("
                f"'{r}:', user_id) AS BINARY)), 1, 8), 16, 10) "
                f"AS BIGINT) % {width}"
            ).alias("bucket"),
        )
        for r in range(depth)
    ]
    agg = (
        stream.select(F.explode(F.array(*rows)).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # complete-mode sketch table: the files path goes through
    # foreachBatch overwrite (runner.py) — depth*width rows either way
    sketch = run_stream(spark, agg, "complete", sink=sink, sink_dir=sink_dir)
    exact = (
        spark.read.parquet(events_path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .filter(F.col("exact_n") >= threshold)
    )
    est = cms_estimate(exact, sketch, key_col="user_id", depth=depth, width=width)
    return est.select(
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("long").alias("overestimate"),
    )
