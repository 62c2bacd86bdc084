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
    max_rounds: int = 40,
) -> DataFrame:
    """All (node, ancestor, depth) pairs reachable via child->parent
    edges, including (node, node, 0). Equivalent to a recursive CTE.

    ``edges`` must be acyclic with at most one parent per child
    (a forest), like the reference's taxonomy.

    Pointer doubling: after round j the closure holds every pair of
    depth <= 2^j, so a depth-D hierarchy needs ceil(log2 D) joins, not
    D — the distributed substitute for the reference's driver-side
    dict walk. Paths of length L in (2^j, 2^(j+1)] split uniquely into
    (first 2^j edges) + (remainder), so no dedup shuffle is needed.
    """
    nodes = (
        edges.select(F.col(child_col).alias("node"))
        .union(edges.select(F.col(parent_col).alias("node")))
        .distinct()
    )
    closure = nodes.select(
        "node", F.col("node").alias("anc"), F.lit(0).cast("long").alias("depth")
    ).unionByName(
        edges.select(
            F.col(child_col).alias("node"),
            F.col(parent_col).alias("anc"),
            F.lit(1).cast("long").alias("depth"),
        )
    ).localCheckpoint(eager=True)

    for j in range(max_rounds):
        pow2 = 2 ** j
        heads = closure.filter(F.col("depth") == pow2).select(
            "node", F.col("anc").alias("mid"), F.col("depth").alias("dh")
        )
        tails = closure.filter(F.col("depth") >= 1).select(
            F.col("node").alias("mid2"), "anc", F.col("depth").alias("dt")
        )
        new = heads.join(tails, heads["mid"] == tails["mid2"]).select(
            "node", "anc", (F.col("dh") + F.col("dt")).alias("depth")
        ).localCheckpoint(eager=True)  # materialize once: reused by isEmpty + union
        if new.isEmpty():
            return closure
        closure = closure.unionByName(new).localCheckpoint(eager=True)
    raise RuntimeError(f"transitive_closure: no fixpoint after {max_rounds} doubling rounds (cycle?)")
