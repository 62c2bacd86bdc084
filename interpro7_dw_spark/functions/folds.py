"""Two-level pinned float folds — deterministic double summation whose
largest in-memory array is bounded regardless of group skew.

A single ``aggregate(array_sort(collect_list(...)))`` per group pins
the accumulation order (so any IEEE-754 engine replays it bit-for-bit)
but materializes the WHOLE group as one array in one task: fine for
bounded groups, a scale-killer for power-law keys (a PageRank hub with
in-degree 10^7, an IVF cell holding 1/nlist of the corpus).

:func:`ordered_fold_sum` keeps the determinism and bounds the array:
rows are bucketed by ``order_col % n_buckets`` (deterministic COLUMN
arithmetic — no RNG, no partition ids), each bucket folds its members
in ``order_col`` order, and the bucket sums fold in bucket order. The
two-level order is pinned, so the result is a (different but equally
deterministic) engine-replayable double: the DuckDB oracles replay the
identical bucket structure (see :func:`ordered_fold_oracle_cte`).
Level-1 arrays hold <= ceil(|group| / n_buckets)-ish members (modulo
the order-key distribution over residues), level-2 arrays hold
<= n_buckets sums.

Both levels are plain ``groupBy`` aggregates: AQE-splittable, partial
collect_list map-side, no windows. Reference parity: this serves the
same role as the reference's sorted-dict accumulation in its store
merge loops (e.g. interpro7dw/utils/store.py dump/merge), re-expressed
as bounded distributed folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ordered_fold_sum(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "fold_sum",
    n_buckets: int = 64,
    count_col: str | None = None,
) -> DataFrame:
    """Per-``group_cols`` sum of ``value_col`` (double) as a two-level
    pinned left fold. ``order_col`` must be a non-negative integral
    column, unique within a group (it defines the fold order AND the
    bucket residue; both engines compute ``%`` identically for
    non-negative values). Returns one row per group:
    (*group_cols, out_col) — plus a long member count when
    ``count_col`` is set (summed exactly, order-free)."""
    bucketed = df.withColumn(
        "__fb", F.pmod(F.col(order_col).cast("long"), F.lit(n_buckets))
    )
    aggs = [
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(value_col).cast("double").alias("x"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("__fs")
    ]
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias("__fn"))
    lvl1 = bucketed.groupBy(*group_cols, "__fb").agg(*aggs)
    aggs2 = [
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("__fb").alias("o"), F.col("__fs").alias("x")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias(out_col)
    ]
    if count_col is not None:
        aggs2.append(F.sum("__fn").alias(count_col))
    return lvl1.groupBy(*group_cols).agg(*aggs2)


def ordered_fold_oracle_cte(
    source: str,
    group_cols: str,
    order_col: str,
    value_expr: str,
    out_col: str = "fold_sum",
    n_buckets: int = 64,
) -> str:
    """DuckDB replay of :func:`ordered_fold_sum` as a SELECT body:
    embed it as a CTE / subquery. ``group_cols`` is a comma-joined
    column list, ``value_expr`` any double-typed expression. The
    ``list_prepend(0.0, ...)`` replays Spark's fold init exactly."""
    return f"""
        SELECT {group_cols},
               list_reduce(list_prepend(0.0::DOUBLE, list(__fs ORDER BY __fb)),
                           (a, b) -> a + b) AS {out_col}
        FROM (
          SELECT {group_cols}, {order_col} % {n_buckets} AS __fb,
                 list_reduce(list_prepend(0.0::DOUBLE,
                                          list({value_expr} ORDER BY {order_col})),
                             (a, b) -> a + b) AS __fs
          FROM {source}
          GROUP BY {group_cols}, {order_col} % {n_buckets}
        )
        GROUP BY {group_cols}
    """
