"""Domain-pipeline catalog entries: run the InterPro match-merge
pipeline (domain/pipeline.py — the reference's X1 task) over
match-shaped data synthesized deterministically from the star schema,
so its throughput shows up in bench and its plumbing in the
correctness run (rows-only: the pipeline's repr-selection search is
not SQL-expressible; its semantics are covered by golden + property
tests in tests/test_domain.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.pipeline import REPR_DOM_DATABASES, merge_protein_matches
from .spec import QuerySpec, register, t

_SIG_DBS = REPR_DOM_DATABASES + ["panther", "hamap"]
_SIG_TYPES = ["domain"] * len(REPR_DOM_DATABASES) + ["family", "region"]


def synth_matches(spark: SparkSession, sf: str):
    """lineitem -> match-shaped rows: order = protein, part = signature,
    positions derived from line number/quantity (deterministic)."""
    li = t(spark, sf, "lineitem")
    pos_from = (F.col("l_partkey") * 13 + F.col("l_linenumber") * 7) % 400 + 1
    return li.select(
        F.concat(F.lit("P"), F.col("l_orderkey")).alias("protein_acc"),
        F.concat(F.lit("SIG"), F.col("l_partkey") % 200).alias("signature_acc"),
        F.lit(None).cast("string").alias("model_acc"),
        pos_from.cast("long").alias("pos_from"),
        (pos_from + (F.col("l_quantity") * 3).cast("long") + 10).alias("pos_to"),
        F.lit(None).cast("string").alias("fragments"),
        F.col("l_discount").alias("score"),
    )


def synth_signatures(spark: SparkSession, sf: str):
    n_dbs = len(_SIG_DBS)
    idx = F.col("sig_id") % n_dbs
    db = F.lit(None).cast("string")
    typ = F.lit(None).cast("string")
    for i, (d, ty) in enumerate(zip(_SIG_DBS, _SIG_TYPES)):
        db = F.when(idx == i, d).otherwise(db)
        typ = F.when(idx == i, ty).otherwise(typ)
    return spark.range(200).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("signature_acc"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.concat(F.lit("sn"), F.col("id")).alias("short_name"),
        F.col("id").alias("sig_id"),
    ).select(
        "signature_acc",
        "name",
        "short_name",
        db.alias("database"),
        typ.alias("type"),
        F.lit("hmm").alias("evidence"),
        # every third signature integrated into an InterPro entry
        F.when(F.col("sig_id") % 3 == 0,
               F.concat(F.lit("IPR"), F.col("sig_id") % 40)).alias("entry_acc"),
    )


def synth_entries(spark: SparkSession, sf: str):
    return spark.range(40).select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        F.concat(F.lit("Entry "), F.col("id")).alias("name"),
        F.concat(F.lit("entry_"), F.col("id")).alias("short_name"),
        F.lit("Domain").alias("type"),
        F.lit(None).cast("string").alias("parent_acc"),
    )


register(QuerySpec(
    name="z_domain_merge_matches",
    tags=("X1", "G5", "W3", "F1", "J2"),
    description="Full InterPro match-merge pipeline (classify -> repr "
    "selection -> signature grouping -> entry condensation) on synthesized "
    "matches; rows-only (search not SQL-expressible; goldens in tests/).",
    build=lambda spark, sf: merge_protein_matches(
        synth_matches(spark, sf), synth_signatures(spark, sf), synth_entries(spark, sf)
    ),
    oracle=None,
))


def _search_documents(spark: SparkSession, sf: str):
    from ..domain.documents import relationship_documents

    orders = t(spark, sf, "orders")
    proteins = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("protein_acc"),
        F.col("c_nationkey").cast("string").alias("tax_id"),
    )
    protein_entries = orders.select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.col("o_orderpriority").alias("entry_acc"),
    ).distinct()
    # "chains" = order years before 1997; later-only customers fall
    # back to chain-less docs, and 1997+ years become structure leftovers
    protein_chains = orders.filter(F.col("o_orderdate") < "1997-01-01").select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.year("o_orderdate").cast("string").alias("pdb_chain"),
    ).distinct()
    entries = orders.select(F.col("o_orderpriority").alias("entry_acc")).distinct()
    structures = orders.select(F.year("o_orderdate").cast("string").alias("pdb_chain")).distinct()
    taxa = t(spark, sf, "nation").select(F.col("n_nationkey").cast("string").alias("tax_id"))
    return relationship_documents(
        proteins, protein_entries, protein_chains, entries, structures, taxa
    )


register(QuerySpec(
    name="search_documents",
    tags=("J9", "J5", "U1"),
    description="Search-document fan-out: (protein x entry x chain) cross "
    "product with fallback docs + anti-join leftovers (reference ES export, "
    "interpro/elastic/export.py:576-701,129-284).",
    build=_search_documents,
    oracle="""
        WITH pe AS (
          SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS protein_acc,
                 o_orderpriority AS entry_acc FROM orders
        ), pc AS (
          SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS protein_acc,
                 CAST(year(o_orderdate) AS VARCHAR) AS pdb_chain
          FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        ), fan AS (
          SELECT CAST(c.c_custkey AS VARCHAR) AS protein_acc,
                 pe.entry_acc, pc.pdb_chain,
                 CAST(c.c_nationkey AS VARCHAR) AS tax_id,
                 'relationship' AS doc_type
          FROM customer c
          LEFT JOIN pe ON pe.protein_acc = CAST(c.c_custkey AS VARCHAR)
          LEFT JOIN pc ON pc.protein_acc = CAST(c.c_custkey AS VARCHAR)
        ), lo_entry AS (
          SELECT NULL AS protein_acc, e.entry_acc, NULL AS pdb_chain,
                 NULL AS tax_id, 'entry' AS doc_type
          FROM (SELECT DISTINCT o_orderpriority AS entry_acc FROM orders) e
          WHERE e.entry_acc NOT IN (SELECT DISTINCT entry_acc FROM fan WHERE entry_acc IS NOT NULL)
        ), lo_struct AS (
          SELECT NULL, NULL, s.pdb_chain, NULL, 'structure'
          FROM (SELECT DISTINCT CAST(year(o_orderdate) AS VARCHAR) AS pdb_chain FROM orders) s
          WHERE s.pdb_chain NOT IN (SELECT DISTINCT pdb_chain FROM fan WHERE pdb_chain IS NOT NULL)
        ), lo_tax AS (
          SELECT NULL, NULL, NULL, CAST(n_nationkey AS VARCHAR), 'taxon'
          FROM nation
          WHERE CAST(n_nationkey AS VARCHAR) NOT IN (SELECT DISTINCT tax_id FROM fan WHERE tax_id IS NOT NULL)
        ), docs AS (
          SELECT * FROM fan
          UNION ALL SELECT * FROM lo_entry
          UNION ALL SELECT * FROM lo_struct
          UNION ALL SELECT * FROM lo_tax
        )
        SELECT concat_ws('-', coalesce(protein_acc, ''), coalesce(entry_acc, ''),
                         coalesce(pdb_chain, ''), coalesce(tax_id, '')) AS doc_id,
               protein_acc, entry_acc, pdb_chain, tax_id, doc_type
        FROM docs
    """,
))
