"""Isolate one (or a few) catalog queries: time N noop-sink runs each
(guide §1.4) under the same engine_cache_scope discipline as bench.py,
with labeled jobs (§1.5), and optionally dump explain("formatted").

Usage:
    python tools/bench_one.py <sf_dir> <query> [query ...] [--n N]
                              [--explain DIR] [--warm]

--warm runs each query once at sf0.001 first (codegen warmup, like
bench.py's warmup pass). Timings print per run, then min/median.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    n = 3
    explain_dir = None
    warm = False
    if "--warm" in args:
        args.remove("--warm")
        warm = True
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i : i + 2]
    sf_dir, names = args[0], args[1:]

    from interpro7_dw_spark.caching import engine_cache_scope
    from interpro7_dw_spark.plans.spec import all_specs
    from interpro7_dw_spark.session import get_spark

    spark = get_spark("bench-one")
    specs = all_specs()

    def run(name: str, d: str) -> float:
        spark.sparkContext.setJobDescription(f"bench_one: {name}")
        try:
            with engine_cache_scope():
                t0 = time.time()
                specs[name].build(spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                return time.time() - t0
        finally:
            spark.sparkContext.setJobDescription(None)

    for name in names:
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            with engine_cache_scope():
                df = specs[name].build(spark, sf_dir)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(f"{explain_dir}/{name}.txt", "w") as f:
                    f.write(buf.getvalue())
        if warm:
            run(name, "/root/testdata/sf0.001")
        ts = []
        for i in range(n):
            t = run(name, sf_dir)
            ts.append(t)
            print(f"{name} run{i + 1}: {t:.3f}s", flush=True)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"RESULT {name}: min={ts[0]:.3f}s median={med:.3f}s n={n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
