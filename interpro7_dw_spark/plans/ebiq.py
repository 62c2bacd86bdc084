"""EBISearch document catalog entry: compose the per-entry search
documents (domain/ebisearch.py — reference ebisearch.py:30-384) from
dims synthesized deterministically off the star schema, and project
them to oracle-comparable rows: canonical sorted field/xref strings,
the chunking weight, and the per-type file chunk assignment.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.ebisearch import chunk_documents, entry_documents
from .domainq import _SIG_DBS, _SIG_TYPES
from .spec import QuerySpec, register, t

_CHUNK_CAP = 500


def synth_ebi_entries(spark: SparkSession):
    ipr = spark.range(40).select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        F.concat(F.lit("Entry "), F.col("id")).alias("name"),
        F.concat(F.lit("entry_"), F.col("id")).alias("short_name"),
        F.lit("Domain").alias("type"),
        F.lit("InterPro").alias("database"),
        F.lit(None).cast("string").alias("integrated_in"),
        # every (4k+1)-th entry is a child of the previous one
        F.when(F.col("id") % 4 == 1, F.concat(F.lit("IPR"), F.col("id") - 1)).alias(
            "parent_acc"
        ),
        F.concat(F.lit("desc "), F.col("id")).alias("description"),
        F.lit("2020-01-01").alias("creation_date"),
    )
    n_dbs = len(_SIG_DBS)
    idx = F.col("id") % n_dbs
    db = F.lit(None).cast("string")
    typ = F.lit(None).cast("string")
    for i, (d, ty) in enumerate(zip(_SIG_DBS, _SIG_TYPES)):
        db = F.when(idx == i, d).otherwise(db)
        typ = F.when(idx == i, ty).otherwise(typ)
    sig = spark.range(200).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("entry_acc"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.concat(F.lit("sn"), F.col("id")).alias("short_name"),
        typ.alias("type"),
        db.alias("database"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("IPR"), F.col("id") % 40)).alias(
            "integrated_in"
        ),
        F.lit(None).cast("string").alias("parent_acc"),
        F.concat(F.lit("sig desc "), F.col("id")).alias("description"),
        F.lit("2019-01-01").alias("creation_date"),
    )
    return ipr.unionByName(sig)


def synth_entry_proteins(spark: SparkSession, sf: str):
    li = t(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_partkey") % 200) % 3 == 0)
        .select(
            F.concat(F.lit("IPR"), (F.col("l_partkey") % 200) % 40).alias("entry_acc"),
            F.concat(F.lit("P"), F.col("l_orderkey")).alias("uniprot_acc"),
            F.concat(F.lit("ID"), F.col("l_orderkey")).alias("uniprot_id"),
            (F.col("l_orderkey") % 2 == 0).alias("in_alphafold"),
        )
        .distinct()
    )


def synth_entry_taxa(spark: SparkSession, sf: str):
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    nation = t(spark, sf, "nation")
    return (
        li.filter((F.col("l_partkey") % 200) % 3 == 0)
        .select(
            F.concat(F.lit("IPR"), (F.col("l_partkey") % 200) % 40).alias("entry_acc"),
            "l_orderkey",
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "entry_acc",
            F.col("c_nationkey").cast("string").alias("tax_id"),
            F.col("n_name").alias("taxon_name"),
        )
        .distinct()
    )


def synth_entry_clans(spark: SparkSession):
    return spark.range(200).filter(F.col("id") % 5 == 0).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("entry_acc"),
        F.concat(F.lit("CL"), F.col("id") % 10).alias("clan_acc"),
    )


def _ebisearch_docs(spark: SparkSession, sf: str):
    docs = entry_documents(
        synth_ebi_entries(spark),
        entry_proteins=synth_entry_proteins(spark, sf),
        entry_taxa=synth_entry_taxa(spark, sf),
        entry_clans=synth_entry_clans(spark),
    )
    chunked = chunk_documents(docs, _CHUNK_CAP)
    return chunked.select(
        "entry_acc",
        "entry_type",
        "n_fields",
        "chunk",
        F.expr(
            "array_join(array_sort(transform(doc.fields, f -> concat(f.name, '=', f.value))), ';')"
        ).alias("fields_str"),
        F.expr(
            "array_join(array_sort(transform(doc.cross_references, x -> concat(x.dbname, '=', x.dbkey))), ';')"
        ).alias("xrefs_str"),
    )


register(QuerySpec(
    name="z_ebisearch_docs",
    tags=("S17", "A8", "F8", "X5"),
    description="EBISearch entry documents (reference ebisearch.py:30-384): "
    "fields/cross_references composition for InterPro entries and member "
    "signatures, chunk weights, and the per-type file chunk assignment — "
    "the reference's greedy flush rule (flush before appending once the "
    "running total would reach the 500-field cap), replayed in the oracle "
    "as a recursive-CTE fold.",
    build=_ebisearch_docs,
    oracle=f"""
WITH RECURSIVE ipr AS (
  SELECT 'IPR' || i AS entry_acc, 'Entry ' || i AS name, 'entry_' || i AS short_name,
         'Domain' AS typ, 'InterPro' AS db, NULL AS integrated_in,
         CASE WHEN i % 4 = 1 THEN 'IPR' || (i - 1) END AS parent_acc,
         'desc ' || i AS description, '2020-01-01' AS creation_date
  FROM (SELECT unnest(generate_series(0, 39)) AS i)
),
sig AS (
  SELECT 'SIG' || i AS entry_acc, 'name' || i AS name, 'sn' || i AS short_name,
         ['domain','domain','domain','domain','domain','domain','domain','family','region'][CAST(i % 9 AS INT) + 1] AS typ,
         ['pfam','cdd','profile','smart','ncbifam','cathgene3d','ssf','panther','hamap'][CAST(i % 9 AS INT) + 1] AS db,
         CASE WHEN i % 3 = 0 THEN 'IPR' || (i % 40) END AS integrated_in,
         NULL AS parent_acc,
         'sig desc ' || i AS description, '2019-01-01' AS creation_date
  FROM (SELECT unnest(generate_series(0, 199)) AS i)
),
clans AS (
  SELECT 'SIG' || i AS entry_acc, 'CL' || (i % 10) AS clan_acc
  FROM (SELECT unnest(generate_series(0, 199)) AS i) WHERE i % 5 = 0
),
eprot AS (
  SELECT DISTINCT 'IPR' || ((l_partkey % 200) % 40) AS entry_acc,
         'P' || l_orderkey AS uniprot_acc, 'ID' || l_orderkey AS uniprot_id,
         l_orderkey % 2 = 0 AS in_alphafold
  FROM lineitem WHERE (l_partkey % 200) % 3 = 0
),
etaxa AS (
  SELECT DISTINCT 'IPR' || ((l_partkey % 200) % 40) AS entry_acc,
         CAST(c_nationkey AS VARCHAR) AS tax_id, n_name AS taxon_name
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE (l_partkey % 200) % 3 = 0
),
rels AS (
  SELECT parent_acc AS entry_acc, entry_acc AS rel_acc FROM ipr WHERE parent_acc IS NOT NULL
  UNION ALL
  SELECT entry_acc, parent_acc AS rel_acc FROM ipr WHERE parent_acc IS NOT NULL
),
member_dbs AS (
  SELECT integrated_in AS entry_acc, db, entry_acc AS sig_acc FROM sig
  WHERE integrated_in IS NOT NULL
),
-- field name=value rows per entry
ipr_fields AS (
  SELECT entry_acc, 'id=' || entry_acc AS fv FROM ipr
  UNION ALL SELECT entry_acc, 'type=' || lower(typ) FROM ipr
  UNION ALL SELECT entry_acc, 'creation_date=' || creation_date FROM ipr
  UNION ALL SELECT entry_acc, 'description=' || description FROM ipr
  UNION ALL SELECT entry_acc, 'source_database=' || db FROM ipr
  UNION ALL SELECT entry_acc, 'name=' || name FROM ipr
  UNION ALL SELECT entry_acc, 'short_name=' || short_name FROM ipr
  UNION ALL SELECT DISTINCT entry_acc, 'contributing_database=' || db FROM member_dbs
  UNION ALL SELECT entry_acc, 'uniprot_id=' || uniprot_id FROM eprot
  UNION ALL SELECT entry_acc, 'taxonomy_name=' || taxon_name FROM etaxa
),
sig_fields AS (
  SELECT entry_acc, 'id=' || entry_acc AS fv FROM sig
  UNION ALL SELECT entry_acc, 'type=' || lower(typ) FROM sig
  UNION ALL SELECT entry_acc, 'creation_date=' || creation_date FROM sig
  UNION ALL SELECT entry_acc, 'description=' || description FROM sig
  UNION ALL SELECT entry_acc, 'source_database=' || db FROM sig
  UNION ALL SELECT entry_acc, 'name=' || name FROM sig
  UNION ALL SELECT entry_acc, 'short_name=' || short_name FROM sig
  UNION ALL SELECT c.entry_acc, 'set=' || c.clan_acc FROM clans c
),
ipr_xrefs AS (
  SELECT entry_acc, upper(db) || '=' || sig_acc AS xv FROM member_dbs
  UNION ALL SELECT entry_acc, 'INTERPRO=' || rel_acc FROM rels
  UNION ALL SELECT entry_acc, 'UNIPROT=' || uniprot_acc FROM eprot
  UNION ALL SELECT entry_acc, 'ALPHAFOLD=' || uniprot_acc FROM eprot WHERE in_alphafold
  UNION ALL SELECT entry_acc, 'TAXONOMY=' || tax_id FROM etaxa
),
sig_xrefs AS (
  SELECT entry_acc, 'INTERPRO=' || integrated_in AS xv FROM sig
  WHERE integrated_in IS NOT NULL
),
all_entries AS (
  SELECT entry_acc, lower(typ) AS entry_type FROM ipr
  UNION ALL SELECT entry_acc, lower(typ) FROM sig
),
fields AS (SELECT * FROM ipr_fields UNION ALL SELECT * FROM sig_fields),
xrefs AS (SELECT * FROM ipr_xrefs UNION ALL SELECT * FROM sig_xrefs),
fagg AS (
  SELECT entry_acc, count(*) AS nf,
         string_agg(fv, ';' ORDER BY fv) AS fields_str
  FROM fields GROUP BY entry_acc
),
xagg AS (
  SELECT entry_acc, count(*) AS nx,
         string_agg(xv, ';' ORDER BY xv) AS xrefs_str
  FROM xrefs GROUP BY entry_acc
),
docs AS (
  SELECT e.entry_acc, e.entry_type,
         CAST(coalesce(f.nf, 0) + coalesce(x.nx, 0) AS BIGINT) AS n_fields,
         coalesce(f.fields_str, '') AS fields_str,
         coalesce(x.xrefs_str, '') AS xrefs_str
  FROM all_entries e
  LEFT JOIN fagg f ON e.entry_acc = f.entry_acc
  LEFT JOIN xagg x ON e.entry_acc = x.entry_acc
),
seq AS (
  SELECT entry_acc, entry_type, n_fields, fields_str, xrefs_str,
         row_number() OVER (PARTITION BY entry_type ORDER BY entry_acc) AS rn
  FROM docs
),
-- the reference's greedy flush (ebisearch.py:322-341): running per-type
-- total; when running + n >= cap (and the file is non-empty) flush and
-- reset — a sequential fold, replayed here as a recursive CTE
fold AS (
  SELECT entry_acc, entry_type, n_fields, rn,
         CAST(0 AS BIGINT) AS chunk, n_fields AS running
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.entry_acc, s.entry_type, s.n_fields, s.rn,
         CASE WHEN f.running + s.n_fields >= {_CHUNK_CAP} AND f.running > 0
              THEN f.chunk + 1 ELSE f.chunk END,
         CASE WHEN f.running + s.n_fields >= {_CHUNK_CAP} AND f.running > 0
              THEN s.n_fields ELSE f.running + s.n_fields END
  FROM fold f JOIN seq s ON s.entry_type = f.entry_type AND s.rn = f.rn + 1
)
SELECT s.entry_acc, s.entry_type, s.n_fields, f.chunk, s.fields_str, s.xrefs_str
FROM seq s JOIN fold f ON s.entry_type = f.entry_type AND s.rn = f.rn
    """,
))
