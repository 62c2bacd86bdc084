"""Skew audit: run the engine's two-phase/capped plans and their
naive single-window/uncapped twins on DELIBERATELY hot-keyed
derivations at sf0.1, and record per-stage task-time distributions
(median, max) from the Spark status store.

The point: a naive ``Window.partitionBy(hot_key)`` puts the hot key's
entire data in ONE task — its heaviest-stage max/median task-time
ratio grows with the skew and is unbounded at 100 TB — while the
two-phase plans keep the ratio near 1 because no task's size depends
on any key's frequency. The uncapped inverted-index join shows the
same story in candidate volume. Results go into PERF.md.

Usage: python tools/skew_audit.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from interpro7_dw_spark.operators import dedup as D
from interpro7_dw_spark.operators import sampling as SM
from interpro7_dw_spark.operators import skew as SK
from interpro7_dw_spark.plans.skewq import (
    _boilerplate_docs,
    _hot_segment_orders,
    _hub_edges,
    _node_labels,
)
from interpro7_dw_spark.session import get_spark


def _task_stats(spark, group: str) -> dict:
    """Heaviest-stage task-runtime stats (ms) for all jobs in a job
    group, read from the status store: the stage with the largest max
    task time dominates the wall clock, so its max/median ratio is the
    straggler signal."""
    tracker = spark.sparkContext.statusTracker()
    store = spark._jsc.sc().statusStore()
    gw = spark.sparkContext._gateway
    q = gw.new_array(spark._jvm.double, 2)
    q[0], q[1] = 0.5, 1.0
    sids = set()
    for j in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(j)
        if info:
            sids.update(info.stageIds)
    worst = {"stage": None, "n_tasks": 0, "median_ms": 0.0, "max_ms": 0.0}
    for sid in sorted(sids):
        opt = store.taskSummary(sid, 0, q)
        if not opt.isDefined():
            continue
        si = tracker.getStageInfo(sid)
        n_tasks = si.numTasks if si else -1
        if n_tasks < 2:
            continue  # a 1-task stage has no straggler ratio to read
        rt = opt.get().executorRunTime()
        med, mx = rt.apply(0), rt.apply(1)
        if mx > worst["max_ms"]:
            worst = {
                "stage": sid,
                "n_tasks": n_tasks,
                "median_ms": med,
                "max_ms": mx,
            }
    worst["max_over_median"] = (
        round(worst["max_ms"] / worst["median_ms"], 1)
        if worst["median_ms"]
        else None
    )
    return worst


def _measure(spark, name: str, df) -> dict:
    spark.sparkContext.setJobGroup(name, name)
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    spark.sparkContext.setJobGroup("", "")
    stats = _task_stats(spark, name)
    stats["wall_s"] = round(wall, 2)
    stats["scenario"] = name
    return stats


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew_audit")
    # the audit reads straggler ratios off shuffle stages: AQE's
    # partition coalescing would fold this small benchmark's partitions
    # into one task and hide the distribution (at 100 TB nothing gets
    # coalesced away); row counts are amplified 10x for measurable tasks
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    results = []

    def amplify(df, key):
        rep = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("__rep")
        return df.select("*", rep).withColumn(
            key, F.col(key) * 10 + F.col("__rep")
        ).drop("__rep")

    # -- scenario 1: top-5 per 90%-hot segment ------------------------
    seg = amplify(_hot_segment_orders(spark, sf), "o_orderkey")
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    two = SK.topk_per_group(seg, ["seg"], order, k=5, bucket_cols=["o_orderkey"])
    naive = seg.withColumn(
        "rk", F.row_number().over(Window.partitionBy("seg").orderBy(*order))
    ).filter(F.col("rk") <= 5)
    assert sorted(map(tuple, two.select("seg", "rk", "o_orderkey").collect())) \
        == sorted(map(tuple, naive.select("seg", "rk", "o_orderkey").collect()))
    spark.catalog.clearCache()
    results.append(_measure(spark, "topk_hot_segment/two_phase", two))
    # honest finding: for a LITERAL k, Catalyst's InferWindowGroupLimit
    # already inserts a map-side per-group limit before the shuffle —
    # the naive pattern is auto-rewritten into the two-phase shape, so
    # it does NOT straggle. Measure it as-rewritten, then with the
    # rule excluded to show what the raw window costs on the hot key.
    results.append(_measure(spark, "topk_hot_segment/naive_window_rewritten", naive))
    rule = "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"
    spark.conf.set("spark.sql.optimizer.excludedRules", rule)
    try:
        results.append(
            _measure(spark, "topk_hot_segment/naive_window_no_rewrite", naive)
        )
    finally:
        spark.conf.unset("spark.sql.optimizer.excludedRules")

    # -- scenario 2: md5-rank in a 95%-hot stratum --------------------
    docs = amplify(
        spark.read.parquet(f"{sf}/orders.parquet"), "o_orderkey"
    ).select(
        F.col("o_orderkey").alias("okey"),
        F.when(F.col("o_orderkey") % 20 < 19, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("cold"), (F.col("o_orderkey") % 7).cast("string"))
        )
        .alias("stratum"),
    )
    two = SM.stratified_sample(
        docs, caps={"hot": 40}, stratum_col="stratum", id_col="okey",
        default_cap=15,
    )
    h = F.md5(F.col("okey").cast("string").cast("binary"))
    naive = (
        docs.withColumn(
            "sample_rank",
            F.row_number()
            .over(Window.partitionBy("stratum").orderBy(h, F.col("okey")))
            .cast("long"),
        )
        .filter(
            F.col("sample_rank")
            <= F.when(F.col("stratum") == "hot", 40).otherwise(15)
        )
    )
    assert sorted(map(tuple, two.select("okey", "stratum", "sample_rank").collect())) \
        == sorted(map(tuple, naive.select("okey", "stratum", "sample_rank").collect()))
    spark.catalog.clearCache()
    results.append(_measure(spark, "stratified_rank/two_phase", two))
    results.append(_measure(spark, "stratified_rank/naive_window", naive))

    # -- scenario 3: inverted-index Jaccard with a universal shingle --
    # candidate volume, not task time, is the blowup axis here: the
    # DF cap bounds each shingle's contribution at cap^2 pairs
    sh = D.shingles(_boilerplate_docs(spark, sf))
    for label, cap in (("df_capped", 25), ("uncapped", None)):
        s = D.drop_hot_shingles(sh, cap) if cap else sh
        a = s.select(F.col("doc_id").alias("da"), "shingle")
        b = s.select(F.col("doc_id").alias("db"), "shingle")
        cand = a.join(b, "shingle").filter(F.col("da") < F.col("db"))
        spark.sparkContext.setJobGroup(f"jaccard/{label}", label)
        t0 = time.time()
        n = cand.count()
        stats = _task_stats(spark, f"jaccard/{label}")
        stats["wall_s"] = round(time.time() - t0, 2)
        stats["scenario"] = f"jaccard_candidates/{label}"
        stats["candidate_pairs"] = n
        spark.sparkContext.setJobGroup("", "")
        spark.catalog.clearCache()
        results.append(stats)

    # -- scenario 4: hot-key JOIN (hub vertex on 50% of fact rows) -----
    # four physical strategies for the same logical join + per-label
    # aggregate (per-row work made real with an xxhash fold so task
    # time scales with rows):
    #   (a) forced shuffle sort-merge join, AQE skew split OFF — the
    #       hub key's whole fact volume lands in ONE reducer;
    #   (b) same join with AQE skew-join splitting enabled (thresholds
    #       lowered so this benchmark's partitions qualify; at 100 TB
    #       the defaults fire on their own);
    #   (c) salted_broadcast_join — dim replicated per salt, the join
    #       keyed on (node, salt) so no single task owns the hub;
    #   (d) plain broadcast join — the honest baseline: for a 1:1
    #       broadcast-sized dim there is NO reducer to skew, so this
    #       already de-skews; (c) earns its keep when the composition
    #       pins partitioning to the join key or the dim fans out.
    # The amplified fact is materialized evenly first so INPUT
    # partition skew (one big parquet file) doesn't pollute the
    # join-stage reading.
    from interpro7_dw_spark.plans.spec import fixture_dir

    fact = _hub_edges(spark, sf).select(F.col("a").alias("node"), "b")
    fact = fact.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(39))).alias("__rep")
    ).drop("__rep")  # 40x rows, hub share unchanged
    fact_dir = fixture_dir("skew_audit_hub_fact", sf)
    fact.repartition(32).write.mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    labels = _node_labels(spark, sf)

    def label_agg(joined):
        return joined.groupBy("label").agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(
                F.pmod(F.xxhash64("b", "label"), F.lit(1_000_000_007))
            ).alias("fold"),
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        results.append(
            _measure(
                spark,
                "join_hot_key/shuffle_no_skew_split",
                label_agg(fact.join(labels, "node")),
            )
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
        results.append(
            _measure(
                spark,
                "join_hot_key/shuffle_aqe_skew_split",
                label_agg(fact.join(labels, "node")),
            )
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    salted = label_agg(
        SK.salted_broadcast_join(fact, labels, "node", salt_source="b")
    )
    plain = label_agg(fact.join(F.broadcast(labels), "node"))
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    spark.catalog.clearCache()
    results.append(_measure(spark, "join_hot_key/salted_broadcast", salted))
    results.append(_measure(spark, "join_hot_key/plain_broadcast", plain))

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
