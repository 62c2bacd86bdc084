"""Iterative graph operators (no Spark builtin).

``transitive_closure`` is the Spark-first form of the reference's
taxonomy lineage walk (reference interpro/oracle/taxa.py:38-53: a
driver-side child->parent dict walk building each node's lineage).
The reference can afford a driver dict because taxonomy is ~2-3M rows;
at 100 TB-scale hierarchies we instead iterate a distributed self-join
to fixpoint. Depth of real hierarchies is small (taxonomy < 40), so
the loop runs O(depth) shuffles; each iteration's frontier shrinks to
nodes that haven't reached a root yet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iters: int = 64,
) -> DataFrame:
    """All (node, ancestor, depth) pairs reachable via child->parent
    edges, including (node, node, 0). Equivalent to a recursive CTE.

    ``edges`` must be acyclic with at most one parent per child
    (a forest), like the reference's taxonomy.
    """
    nodes = (
        edges.select(F.col(child_col).alias("node"))
        .union(edges.select(F.col(parent_col).alias("node")))
        .distinct()
    )
    closure = nodes.select("node", F.col("node").alias("anc"), F.lit(0).alias("depth"))
    frontier = closure
    parents = edges.select(
        F.col(child_col).alias("__c"), F.col(parent_col).alias("__p")
    ).cache()
    results = [closure]
    for _ in range(max_iters):
        frontier = (
            frontier.join(parents, frontier["anc"] == parents["__c"])
            .select("node", F.col("__p").alias("anc"), (F.col("depth") + 1).alias("depth"))
        ).localCheckpoint(eager=True)  # cut lineage so plans don't grow per iter
        if frontier.isEmpty():
            break
        results.append(frontier)
    else:
        raise RuntimeError(f"transitive_closure: no fixpoint after {max_iters} iterations (cycle?)")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
