"""Local differential-correctness harness: run every QuerySpec on
Spark AND its oracle SQL on DuckDB, compare row count, column names,
and order-insensitive values — a faithful stand-in for the driver's
CORRECTNESS gate so failures surface before a round ends.

Usage:
    python tools/differ.py [sf_dir] [query ...]

Do NOT run two sweeps (or a sweep and tests/test_catalog.py, which is
the same comparison as a pytest matrix) CONCURRENTLY in separate
processes: the streaming specs rebuild shared state directories under
spark-warehouse/fixtures per run (rmtree + reseed), so two processes
executing the same spec race on those paths and produce spurious
one-off mismatches.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from interpro7_dw_spark.caching import engine_cache_scope
    from interpro7_dw_spark.plans.spec import all_specs
    from interpro7_dw_spark.session import get_spark
    from interpro7_dw_spark.testing import compare_spec, make_duck_con

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("differ")
    con = make_duck_con(sf_dir)

    specs = all_specs()
    unknown = only - set(specs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    n_run = 0
    failures = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            # operators that persist an intermediate return it lazily;
            # the scope releases exactly those owned_persist blocks, so
            # a full-catalog sweep never accumulates query caches (and
            # never nukes unrelated user caches like clearCache did)
            with engine_cache_scope():
                problems = compare_spec(spec, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + " | ".join(problems))
        else:
            kind = "ok~  " if spec.oracle is None else "ok   "
            print(f"{kind} {name} ({time.time() - t0:.1f}s)")

    print(f"\n{n_run - len(failures)}/{n_run} matched")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
