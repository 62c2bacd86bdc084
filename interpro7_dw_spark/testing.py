"""Differential-testing helpers shared by tools/differ.py and tests/.

Comparison contract mirrors the driver's correctness gate: row count,
column-name set, and order-insensitive value comparison with columns
sorted by name.

The driver's value-hash stringifies *pandas* cells (Spark
``toPandas()`` vs DuckDB ``.df()``), which coerces dtypes: DuckDB
renders every DECIMAL and HUGEINT as float64 (``'1234.5'``,
``'42.0'``) while Spark keeps ``Decimal('1234.5000')`` / int64
(``'42'``). ``compare_spec`` therefore checks BOTH the raw-row
normalization and the pandas-string normalization; query specs must
emit only pandas-stable types (string / int / double / bool) in the
final projection — see plans/spec.py conventions.
"""

from __future__ import annotations

import math
from decimal import Decimal


def normalize(v) -> str:
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rows_key(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalize(r[i]) for i in order) for r in rows)


def _pd_cell(v) -> str:
    # Nulls stringify differently across engines/versions (Spark
    # toPandas -> None, DuckDB .df() -> nan/None/NaT); fold every
    # NA-ish scalar to one sentinel so only REAL value differences
    # fail. Specs avoid nullable output columns anyway, so this only
    # de-noises the check, it cannot hide a divergence the raw
    # rows_key comparison (which runs first) would catch.
    try:
        import pandas as pd

        if v is None or (not isinstance(v, (str, bytes, list, tuple)) and pd.isna(v)):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def pandas_rows_key(pdf) -> list[tuple[str, ...]]:
    """The driver-gate normalization: stringified pandas cells, columns
    sorted by name, rows sorted."""
    pdf = pdf[sorted(pdf.columns)]
    return sorted(tuple(_pd_cell(v) for v in row) for row in pdf.itertuples(index=False))


def compare_spec(spec, spark, duck_con, sf_dir: str) -> list[str]:
    """Run one QuerySpec on Spark and DuckDB; return a list of problems
    (empty = match). For oracle-less specs only checks the build runs."""
    sdf = spec.build(spark, sf_dir)
    scols = sdf.columns
    if spec.oracle is not None:
        # both normalizations materialize this plan; persist so the
        # full query executes once, not twice
        sdf = sdf.persist()
    try:
        srows = [tuple(r) for r in sdf.collect()]
        if spec.oracle is None:
            return []
        cur = duck_con.execute(spec.oracle)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            sk, ok = rows_key(scols, srows), rows_key(ocols, orows)
            if sk != ok:
                diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if not problems:
            # replicate the driver's pandas-stringify hash exactly
            spk = pandas_rows_key(sdf.toPandas())
            opk = pandas_rows_key(duck_con.execute(spec.oracle).df())
            if spk != opk:
                diff = [(a, b) for a, b in zip(spk, opk) if a != b][:3]
                problems.append(f"pandas-normalized values differ; first diffs: {diff}")
        return problems
    finally:
        if spec.oracle is not None:
            sdf.unpersist()


def max_job_id(spark) -> int:
    """Highest Spark job id seen by the app status store — a
    monotonic resource clock. Diffing it across maintenance epochs
    gives the per-epoch JOB COUNT, the deterministic flatness
    invariant the multi-epoch IVM stressors assert (constant jobs per
    epoch == cost tracks |delta|, not release age) instead of flaky
    wall-clock medians. Status-store eviction never breaks it: job
    ids only grow."""
    jl = spark._jsc.sc().statusStore().jobsList(None)
    return max(
        (jl.apply(i).jobId() for i in range(jl.size())), default=-1
    )


def stage_metrics_between(spark, j0: int, j1: int) -> dict:
    """Aggregate stage metrics (input records/bytes, shuffle-write
    records) across every stage of the jobs in the ``(j0, j1]`` job-id
    window (marks from :func:`max_job_id`) — the measured per-epoch
    IO of a maintenance step. This is how the COW support/fact stores
    prove 'per-epoch IO tracks |touched buckets|, not |store|' with
    numbers instead of assertions about plans."""
    store = spark._jsc.sc().statusStore()
    jl = store.jobsList(None)
    sids = set()
    for i in range(jl.size()):
        j = jl.apply(i)
        if j0 < j.jobId() <= j1:
            it = j.stageIds().iterator()
            while it.hasNext():
                sids.add(int(str(it.next())))
    gw = spark.sparkContext._gateway
    empty = gw.jvm.java.util.ArrayList()
    sl = store.stageList(
        empty, False, False, gw.new_array(gw.jvm.double, 0), empty
    )
    # one StageData row PER ATTEMPT: on a stage retry both attempts
    # would otherwise contribute, inflating the per-epoch IO that the
    # COW tests bound with hard thresholds — keep only the latest
    # attempt of each stage
    latest: dict[int, object] = {}
    for i in range(sl.size()):
        sd = sl.apply(i)
        sid = int(sd.stageId())
        if sid not in sids:
            continue
        prev = latest.get(sid)
        if prev is None or int(sd.attemptId()) > int(prev.attemptId()):
            latest[sid] = sd
    out = {"input_records": 0, "input_bytes": 0, "shuffle_write_records": 0}
    for sd in latest.values():
        out["input_records"] += int(sd.inputRecords())
        out["input_bytes"] += int(sd.inputBytes())
        out["shuffle_write_records"] += int(sd.shuffleWriteRecords())
    return out


def stage_input_records_between(spark, j0: int, j1: int) -> int:
    """Total INPUT RECORDS in the ``(j0, j1]`` job window — see
    :func:`stage_metrics_between`."""
    return stage_metrics_between(spark, j0, j1)["input_records"]


def make_duck_con(sf_dir: str):
    import duckdb

    from .sources.catalog import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con
