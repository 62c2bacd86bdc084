"""Interval algebra as higher-order column functions (JVM-side).

The reference computes residue coverage by materializing a 0/1 bitmap
per position (interpro/xrefs/utils.py:22-54) and unioning position
sets (interpro/oracle/matches.py:186-191). Exploding positions is
O(total span) rows; at 100 TB that multiplies the shuffle by the mean
interval length. These fold-based forms stay O(#intervals): sort the
interval array, single pass, no row explosion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interval_union_length(intervals: Column) -> Column:
    """Total number of integer positions covered by a union of
    inclusive [s, e] intervals, given as array<struct<s,e>>.

    Equivalent to ``count(DISTINCT pos)`` over the exploded positions,
    computed as a sorted fold: O(n log n) per group instead of
    O(sum of spans) exploded rows.
    """
    sorted_iv = F.array_sort(intervals)  # struct order: by s, then e
    folded = F.aggregate(
        sorted_iv,
        F.struct(
            F.lit(0).cast("long").alias("len"),
            F.lit(None).cast("long").alias("hi"),  # highest covered position so far
        ),
        lambda acc, iv: F.struct(
            (
                acc["len"]
                + F.when(
                    acc["hi"].isNotNull() & (iv["e"] <= acc["hi"]), F.lit(0).cast("long")
                ).otherwise(
                    iv["e"]
                    - F.greatest(iv["s"], F.coalesce(acc["hi"] + 1, iv["s"]))
                    + 1
                )
            ).alias("len"),
            F.greatest(iv["e"], F.coalesce(acc["hi"], iv["e"])).alias("hi"),
        ),
    )
    return folded["len"]


def condense_intervals(intervals: Column) -> Column:
    """Merge overlapping/adjacent inclusive [s, e] intervals into a
    minimal sorted disjoint set (array<struct<s,e>> in, same out).

    The array-fold form of the reference's location condensation
    (interpro/oracle/matches.py:60-103; there with a 10%-overlap merge
    rule, here exact touch-or-overlap — pass widened intervals to get
    tolerance merging).
    """
    sorted_iv = F.array_sort(intervals)
    merged = F.aggregate(
        sorted_iv,
        F.expr("CAST(array() AS array<struct<s BIGINT, e BIGINT>>)"),
        lambda acc, iv: F.when(
            (F.size(acc) > 0)
            & (iv["s"] <= F.element_at(acc, -1)["e"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(F.element_at(acc, -1)["e"], iv["e"]).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(iv["s"].cast("bigint").alias("s"), iv["e"].cast("bigint").alias("e"))))
        ),
    )
    return merged
