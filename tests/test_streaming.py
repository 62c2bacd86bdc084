"""Streaming tests: stateful sessionization across micro-batches and
the jsonify sink rule."""

from __future__ import annotations

from pyspark.sql import functions as F

GAP = 1_800_000_000  # 30 min in micros


def _run_sessionize(spark, src, chk, out):
    from interpro7_dw_spark.streaming.stateful import sessionize_stream

    stream = spark.readStream.schema("user_id long, ts_us long").parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)  # shared: state carries across runs
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(tuple(r) for r in spark.read.parquet(out).collect())


def test_stateful_sessionization_across_batches(spark, tmp_path):
    src, chk, out = (str(tmp_path / d) for d in ("src", "chk", "out"))

    # batch 1: user 1 has two sessions (gap > 30min), second still open
    spark.createDataFrame(
        [(1, 0), (1, 1000), (1, GAP + 2000), (2, 0)], "user_id long, ts_us long"
    ).write.parquet(src)
    first = _run_sessionize(spark, src, chk, out)
    # only user 1's FIRST session closed (events at 0 and 1000)
    assert first == [(1, 0, 1000, 2)]

    # batch 2: an event far ahead closes both open sessions
    spark.createDataFrame(
        [(1, 3 * GAP), (2, 3 * GAP)], "user_id long, ts_us long"
    ).write.mode("append").parquet(src)
    second = _run_sessionize(spark, src, chk, out)
    assert (1, GAP + 2000, GAP + 2000, 1) in second  # user 1's open session closed
    assert (2, 0, 0, 1) in second                    # user 2's too
    assert (1, 0, 1000, 2) in second                 # batch-1 output retained


def test_jsonify_empty_to_null(spark):
    from interpro7_dw_spark.functions.json_out import jsonify

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id int, xs array<string>"
    ).select("id", jsonify(F.col("xs")).alias("js"))
    got = {r["id"]: r["js"] for r in df.collect()}
    assert got == {1: '["a","b"]', 2: None, 3: None}
