"""Phase profiler for the stream_ivm_mart_entry spec: replays the
spec body with wall timers around each phase (fixture build, state
seed, stream drain, render) so optimization targets the phase that
actually costs — guide §1 (measure first). Read-only on the catalog;
uses the same fixture_dir the spec uses.

Usage: python tools/profile_stream_entry.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from interpro7_dw_spark.caching import engine_cache_scope
    from interpro7_dw_spark.operators.cdc import snapshot_delta_images
    from interpro7_dw_spark.plans.marts import _entry_release_tables
    from interpro7_dw_spark.plans.spec import fixture_dir
    from interpro7_dw_spark.session import get_spark
    from interpro7_dw_spark.streaming.mart_stream import (
        maintain_entry_mart_stream,
        seed_entry_mart_state,
        unify_entry_changelogs,
    )

    spark = get_spark("profile_stream_entry")
    sc = spark.sparkContext
    marks: list[tuple[str, float]] = []

    def mark(label: str, t0: float) -> None:
        marks.append((label, time.time() - t0))
        print(f"{label:28s} {time.time() - t0:7.2f}s", flush=True)

    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    for it in range(n_iters):
        print(f"--- iteration {it} ---", flush=True)
        run_once(spark, sc, sf, mark)

    print("|".join(f"{k}={v:.2f}" for k, v in marks))
    spark.stop()


def run_once(spark, sc, sf, mark) -> None:
    from pyspark.sql import functions as F

    from interpro7_dw_spark.caching import engine_cache_scope
    from interpro7_dw_spark.operators.cdc import snapshot_delta_images
    from interpro7_dw_spark.plans.marts import _entry_release_tables
    from interpro7_dw_spark.plans.spec import fixture_dir
    from interpro7_dw_spark.streaming.mart_stream import (
        maintain_entry_mart_stream,
        seed_entry_mart_state,
        unify_entry_changelogs,
    )

    with engine_cache_scope():
        t_all = time.time()
        t0 = time.time()
        r = _entry_release_tables(spark, sf)
        dpe = snapshot_delta_images(
            r["pe_old"], r["pe_new"], ["pe_id"], ["protein_acc", "entry_acc"]
        )
        dp = snapshot_delta_images(
            r["p_old"], r["p_new"], ["protein_acc"], ["tax_id"]
        )
        unified = unify_entry_changelogs(dpe, dp)
        root = fixture_dir("ivm_mart_entry_stream", sf)
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(root + "_state", ignore_errors=True)
        shutil.rmtree(root + "_state_chk", ignore_errors=True)
        mark("plan+rmtree", t0)

        t0 = time.time()
        split = F.coalesce(F.col("pe_id") % 3, F.ascii(F.col("protein_acc")) % 3)
        unified = unified.persist()
        for part in range(3):
            sc.setJobDescription(f"fixture write {part}")
            unified.filter(split == part).coalesce(1).write.mode(
                "append"
            ).parquet(f"{root}/changes")
        unified.unpersist()
        mark("fixture writes (3)", t0)

        t0 = time.time()
        sc.setJobDescription("seed entry mart state")
        state = root + "_state"
        seed_entry_mart_state(
            spark, r["p_old"], r["pe_old"], r["pp"], r["ps"], r["pec"],
            state, n_buckets=16,
        )
        mark("seed_entry_mart_state", t0)

        t0 = time.time()
        sc.setJobDescription("stream drain (3 epochs)")
        stream = (
            spark.readStream.schema(unified.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{root}/changes")
        )
        out = maintain_entry_mart_stream(
            spark, stream, state, r["pp"], r["ps"], r["pec"],
            entry_go=r["ego"], n_buckets=16,
        )
        mark("stream drain (3 epochs)", t0)

        t0 = time.time()
        sc.setJobDescription("render noop")
        out.write.mode("overwrite").format("noop").save()
        mark("render+noop", t0)
        mark("TOTAL", t_all)
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
