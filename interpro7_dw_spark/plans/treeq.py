"""Tree-operator catalog entries promoted to full value oracles:

- ``tree_taxon_nodes`` (A10): the flat node relation of the per-entry
  taxonomic distribution tree (domain/taxonomy.py — reference
  interpro/xrefs/entries.py:405-466) over a region->nation->customer
  taxonomy with gap ranks, so synthetic gap-uid generation, per-node
  protein/species accumulation and parent chaining are all hash-checked;
- ``tree_hierarchy_json`` (G2): nested hierarchy JSON
  (operators/graph.py hierarchy_tree_json — reference
  interpro/mysql/entries.py:96-154) replayed in DuckDB as three levels
  of nested string_agg (the fixture hierarchy is depth-3 by
  construction, so no recursion is needed).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.taxonomy import taxon_distribution_nodes
from ..operators.graph import hierarchy_tree_json
from .spec import QuerySpec, register, t


def synth_taxa(spark: SparkSession, sf: str):
    """region (rank domain) -> nation (rank phylum, kingdom gap) ->
    customer (rank species, class..genus gaps)."""
    region = t(spark, sf, "region").select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("tax_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.lit("domain").alias("rank"),
        F.col("r_name").alias("sci_name"),
    )
    nation = t(spark, sf, "nation").select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("tax_id"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("parent_id"),
        F.lit("phylum").alias("rank"),
        F.col("n_name").alias("sci_name"),
    )
    customer = t(spark, sf, "customer").select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("tax_id"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("parent_id"),
        F.lit("species").alias("rank"),
        F.col("c_name").alias("sci_name"),
    )
    return region.unionByName(nation).unionByName(customer)


def synth_tax_facts(spark: SparkSession, sf: str):
    orders = t(spark, sf, "orders")
    return orders.groupBy(
        F.col("o_orderpriority").alias("entry_acc"),
        F.concat(F.lit("C"), F.col("o_custkey")).alias("tax_id"),
    ).agg(
        F.count("*").alias("num_proteins"),
        F.lit(True).alias("is_species"),
    )


def _tree_taxon_nodes(spark: SparkSession, sf: str):
    return taxon_distribution_nodes(
        synth_tax_facts(spark, sf), synth_taxa(spark, sf)
    )


register(QuerySpec(
    name="z_tree_taxon_nodes",
    tags=("A10", "A9", "G1"),
    description="Flat node relation of the per-entry taxonomic "
    "distribution tree (reference interpro/xrefs/entries.py:405-466): "
    "8-slot main-rank paths with synthetic gap uids "
    "(<last_real_id>-<rank_index>), per-node protein/species sums, "
    "parent-uid chain. The nesting kernel on top is golden-tested "
    "(tests/test_taxonomy.py).",
    build=_tree_taxon_nodes,
    oracle="""
WITH f AS (
  SELECT o_orderpriority AS entry_acc, o_custkey AS ck,
         count(*) AS n
  FROM orders GROUP BY 1, 2
),
fc AS (
  SELECT f.*, c_nationkey AS nk, c_name,
         n_regionkey AS rk
  FROM f
  JOIN customer ON ck = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
),
l0 AS (
  SELECT entry_acc, 'R' || rk AS uid, 0 AS level, NULL AS parent_uid,
         'R' || rk AS nid, r_name AS name,
         CAST(sum(n) AS BIGINT) AS proteins, CAST(count(*) AS BIGINT) AS species
  FROM fc JOIN region ON rk = r_regionkey
  GROUP BY entry_acc, rk, r_name
),
l1 AS (
  SELECT entry_acc, 'R' || rk || '-1' AS uid, 1 AS level, 'R' || rk AS parent_uid,
         NULL AS nid, NULL AS name,
         CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT)
  FROM fc GROUP BY entry_acc, rk
),
l2 AS (
  SELECT entry_acc, 'N' || nk AS uid, 2 AS level, 'R' || rk || '-1' AS parent_uid,
         'N' || nk AS nid, n_name AS name,
         CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT)
  FROM fc JOIN nation ON nk = n_nationkey
  GROUP BY entry_acc, nk, rk, n_name
),
gaps AS (
  -- consecutive gap uids accumulate suffixes (reference
  -- entries.py:418-421: unique_id += "-{i}" keeps compounding)
  SELECT entry_acc,
         'N' || nk || ['-3','-3-4','-3-4-5','-3-4-5-6'][lvl - 2] AS uid,
         lvl AS level,
         CASE WHEN lvl = 3 THEN 'N' || nk
              ELSE 'N' || nk || ['-3','-3-4','-3-4-5'][lvl - 3] END AS parent_uid,
         NULL AS nid, NULL AS name,
         CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT)
  FROM fc, (SELECT unnest(generate_series(3, 6)) AS lvl)
  GROUP BY entry_acc, nk, lvl
),
l7 AS (
  SELECT entry_acc, 'C' || ck AS uid, 7 AS level,
         'N' || nk || '-3-4-5-6' AS parent_uid,
         'C' || ck AS nid, c_name AS name,
         CAST(n AS BIGINT), CAST(1 AS BIGINT)
  FROM fc
)
SELECT * FROM l0 UNION ALL SELECT * FROM l1 UNION ALL SELECT * FROM l2
UNION ALL SELECT * FROM gaps UNION ALL SELECT * FROM l7
    """,
))


def _tree_hierarchy_json(spark: SparkSession, sf: str):
    nation = t(spark, sf, "nation")
    customer = t(spark, sf, "customer").filter(F.col("c_custkey") % 20 == 0)
    edges = nation.select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("child"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("parent"),
    ).unionByName(
        customer.select(
            F.concat(F.lit("C"), F.col("c_custkey")).alias("child"),
            F.concat(F.lit("N"), F.col("c_nationkey")).alias("parent"),
        )
    )
    labels = (
        t(spark, sf, "region")
        .select(F.concat(F.lit("R"), F.col("r_regionkey")).alias("id"), F.col("r_name").alias("label"))
        .unionByName(
            nation.select(F.concat(F.lit("N"), F.col("n_nationkey")).alias("id"), F.col("n_name").alias("label"))
        )
        .unionByName(
            customer.select(F.concat(F.lit("C"), F.col("c_custkey")).alias("id"), F.col("c_name").alias("label"))
        )
    )
    return hierarchy_tree_json(edges, labels)


register(QuerySpec(
    name="tree_hierarchy_json",
    tags=("G2", "G1", "F8"),
    description="Nested hierarchy-tree JSON, one row per root "
    "(reference interpro/mysql/entries.py:96-154): children ordered by "
    "id, name from the label dim, children key only on internal nodes. "
    "Oracle replays the nesting as three levels of string_agg over the "
    "depth-3 region->nation->customer fixture.",
    build=_tree_hierarchy_json,
    oracle="""
WITH custs AS (
  SELECT 'C' || c_custkey AS id, c_name AS name, 'N' || c_nationkey AS parent
  FROM customer WHERE c_custkey % 20 = 0
),
cjson AS (
  SELECT parent AS nid,
         '[' || string_agg('{"id":"' || id || '","name":"' || name || '"}',
                           ',' ORDER BY id) || ']' AS children
  FROM custs GROUP BY parent
),
njson AS (
  SELECT 'R' || n_regionkey AS rid, 'N' || n_nationkey AS id,
         '{"id":"N' || n_nationkey || '","name":"' || n_name || '"'
           || coalesce(',"children":' || c.children, '') || '}' AS node
  FROM nation LEFT JOIN cjson c ON 'N' || n_nationkey = c.nid
)
SELECT r.rid AS root,
       '{"id":"' || r.rid || '","name":"' || region.r_name || '","children":['
         || string_agg(r.node, ',' ORDER BY r.id) || ']}' AS tree
FROM njson r
JOIN region ON r.rid = 'R' || r_regionkey
GROUP BY r.rid, region.r_name
    """,
))
