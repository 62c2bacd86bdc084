"""Differential-testing helpers shared by tools/differ.py and tests/.

Comparison contract mirrors the driver's correctness gate: row count,
column-name set, and order-insensitive value comparison with columns
sorted by name.
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


def compare_spec(spec, spark, duck_con, sf_dir: str) -> list[str]:
    """Run one QuerySpec on Spark and DuckDB; return a list of problems
    (empty = match). For oracle-less specs only checks the build runs."""
    sdf = spec.build(spark, sf_dir)
    scols = sdf.columns
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
    return problems


def make_duck_con(sf_dir: str):
    import duckdb

    from .sources.catalog import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con
