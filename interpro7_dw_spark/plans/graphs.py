"""Graph / recursive query catalog (SURVEY.md §2.9).

``closure_depths`` re-expresses the reference's taxonomy lineage
closure (interpro/oracle/taxa.py:38-53) as an iterative distributed
self-join (operators/graph.py) — the oracle is a recursive CTE.

``part_pair_cooccurrence`` is the reference's similarity-graph shape
(clan alignment graph interpro/oracle/clans.py:89-162; sim-entries
pair counting interpro/xrefs/entries.py:28-136): canonicalized pair
explosion + groupBy, with the a<b trick so each edge appears once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.graph import transitive_closure
from .spec import QuerySpec, register, t


def _parent_edges(spark: SparkSession, sf: str):
    # synthetic forest over customers: parent(k) = floor(k/2), root=0
    return (
        t(spark, sf, "customer")
        .filter(F.col("c_custkey") > 0)
        .select(
            F.col("c_custkey").alias("child"),
            F.floor(F.col("c_custkey") / 2).cast("long").alias("parent"),
        )
    )


def _closure_depths(spark: SparkSession, sf: str):
    return (
        transitive_closure(_parent_edges(spark, sf), "child", "parent")
        .select(F.col("node").cast("long"), F.col("anc").cast("long"), F.col("depth").cast("int"))
    )


register(QuerySpec(
    name="closure_depths",
    tags=("G1",),
    description="Transitive closure of a hierarchy to fixpoint — every "
    "(node, ancestor, depth) pair incl. self at depth 0.",
    build=_closure_depths,
    oracle="""
        WITH RECURSIVE nodes AS (
          -- explicit DISTINCT: inside a RECURSIVE with-clause DuckDB
          -- gives UNION recursive semantics, not a plain dedup
          SELECT DISTINCT node FROM (
            SELECT c_custkey AS node FROM customer WHERE c_custkey > 0
            UNION ALL
            SELECT CAST(floor(c_custkey / 2) AS BIGINT) FROM customer WHERE c_custkey > 0
          )
        ), anc AS (
          SELECT node, node AS anc, 0 AS depth FROM nodes
          UNION ALL
          SELECT a.node, CAST(floor(a.anc / 2) AS BIGINT), a.depth + 1
          FROM anc a
          WHERE a.anc > 0
        )
        SELECT CAST(node AS BIGINT) AS node, CAST(anc AS BIGINT) AS anc,
               CAST(depth AS INT) AS depth
        FROM anc
    """,
))


def _part_pairs(spark: SparkSession, sf: str):
    # persist: the distinct() feeds both sides of the self-join
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct().persist()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


register(QuerySpec(
    name="part_pair_cooccurrence",
    tags=("G6", "G7", "J8"),
    description="Canonicalized co-occurrence edge list with min-support filter.",
    build=_part_pairs,
    oracle="""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_orders
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
))
