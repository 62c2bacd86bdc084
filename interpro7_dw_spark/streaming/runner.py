"""Run a finite streaming query to completion and hand back its
result as a DataFrame — through one of two sinks:

- ``memory`` (default): the classic test/oracle harness sink. Every
  emitted row is collected into the driver's in-memory table — fine
  for the differential-correctness gate, WRONG for production scale
  (the driver would hold the whole output).
- ``files``: the production path. Append-mode queries write parquet
  through the exactly-once file sink (offsets + commit log under the
  checkpoint dir); complete-mode queries go through ``foreachBatch``
  with an overwrite parquet write (the standard pattern — the file
  sink itself is append-only). No result row ever transits the
  driver; the returned DataFrame is a plain parquet scan of the sink
  directory.

The streamed-equals-batch tests run both sinks and assert equal
results (tests/test_streaming.py), so the memory sink stays an
oracle-harness convenience, never a semantic dependency.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_stream(
    spark: SparkSession,
    out: DataFrame,
    output_mode: str,
    sink: str = "memory",
    sink_dir: str | None = None,
) -> DataFrame:
    """Execute ``out`` (a streaming DataFrame) with
    ``trigger(availableNow=True)`` to termination and return the
    emitted result. ``sink='files'`` requires ``sink_dir``."""
    if sink == "memory":
        name = "stream_" + uuid.uuid4().hex[:12]
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)
    if sink != "files":
        raise ValueError(f"unknown sink {sink!r} (expected 'memory' or 'files')")
    if not sink_dir:
        raise ValueError("sink='files' requires sink_dir")
    data_dir = sink_dir + "/data"
    chk_dir = sink_dir + "/chk"
    # a reused sink_dir would silently resume from the old checkpoint
    # and mix previously-committed rows into this run's result —
    # require a fresh directory instead of guessing intent
    if os.path.exists(chk_dir) or os.path.exists(data_dir):
        raise ValueError(
            f"sink_dir {sink_dir!r} already holds a previous run's "
            "checkpoint/data; pass a fresh directory"
        )
    if output_mode == "append":
        writer = (
            out.writeStream.format("parquet")
            .option("path", data_dir)
            .option("checkpointLocation", chk_dir)
            .outputMode("append")
        )
    else:
        # parquet file sink is append-only; complete/update-mode
        # results flow through foreachBatch + overwrite — each
        # micro-batch replaces the materialized aggregate (executors
        # write, the driver only coordinates)
        writer = (
            out.writeStream.foreachBatch(
                lambda batch, _epoch: batch.write.mode("overwrite").parquet(
                    data_dir
                )
            )
            .option("checkpointLocation", chk_dir)
            .outputMode(output_mode)
        )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    if not os.path.exists(data_dir):
        # a source that yielded zero micro-batches never created the
        # sink path — return an EMPTY result with the query's schema
        # instead of throwing on the missing directory
        return spark.createDataFrame([], out.schema)
    return spark.read.parquet(data_dir)
