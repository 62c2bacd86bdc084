"""webfront_proteome mart-family catalog entries (domain/
proteome_mart.py — reference interpro/mysql/proteomes.py:11-188) over
a synthetic proteome world:

  proteomes      = customer market segments (proteins join their
                   segment's proteome when c_acctbal >= 0, mirroring
                   the nullable protein->proteome store); the
                   proteome's taxon = N<min nationkey among members>
                   (the reference reads the taxon off a member protein,
                   xrefs/proteomes.py:38-41 — min() makes that pick
                   deterministic);
  protein facts  = matches from orders (SIG(o_orderkey%50) in
                   DB(sig%4)); PDB cross-references PDB(o_orderkey%30)
  entry-side structures (structure-level matches at the STRUCTURE's
                   taxon) = suppliers: N<s_nationkey> x SIG(s_suppkey
                   %50) x PDB(s_suppkey%30), attached to proteomes
                   through the proteome taxon exactly like
                   xrefs/proteomes.py:93-116.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.proteome_mart import proteome_marts
from .spec import QuerySpec, register, t
from .taxmartq import _facts


def _proteome_dim(spark: SparkSession, sf: str):
    return (
        t(spark, sf, "customer")
        .filter(F.col("c_acctbal") >= 0)
        .groupBy(F.col("c_mktsegment").alias("proteome_id"))
        .agg(F.min("c_nationkey").alias("k"))
        .select(
            "proteome_id",
            F.concat(F.lit("Proteome "), F.col("proteome_id")).alias("name"),
            (F.col("k") % 2 == 0).alias("is_reference"),
            F.concat(F.lit("strain-"), F.col("proteome_id")).alias("strain"),
            F.concat(F.lit("asm-"), F.col("proteome_id")).alias("assembly"),
            F.concat(F.lit("N"), F.col("k")).alias("taxon_id"),
        )
    )


def _marts(spark: SparkSession, sf: str):
    protein_base, protein_matches, protein_structures, entry_pdb = _facts(spark, sf)
    return proteome_marts(
        _proteome_dim(spark, sf),
        protein_base,
        protein_matches,
        protein_structures,
        entry_pdb.withColumnRenamed("tax_id", "taxon_id"),
    )


_SYN = """
  pdim AS (
    SELECT c_mktsegment AS proteome_id, min(c_nationkey) AS k
    FROM customer WHERE c_acctbal >= 0 GROUP BY 1
  ),
  pbase AS (
    SELECT CAST(c_custkey AS VARCHAR) AS protein_acc,
           c_mktsegment AS proteome_id
    FROM customer WHERE c_acctbal >= 0
  ),
  base_agg AS (
    SELECT proteome_id, count(*) AS n_proteins FROM pbase GROUP BY 1
  ),
  pmatch AS (
    SELECT CAST(o_custkey AS VARCHAR) AS protein_acc,
           'DB' || ((o_orderkey % 50) % 4) AS db,
           'SIG' || (o_orderkey % 50) AS entry_acc
    FROM orders
  ),
  pstruct AS (
    SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS protein_acc,
           'PDB' || (o_orderkey % 30) AS pdb_id
    FROM orders
  ),
  epdb0 AS (
    SELECT DISTINCT 'N' || s_nationkey AS tax_id,
           'DB' || ((s_suppkey % 50) % 4) AS db,
           'SIG' || (s_suppkey % 50) AS entry_acc,
           'PDB' || (s_suppkey % 30) AS pdb_id
    FROM supplier
  ),
  epdb AS (
    SELECT DISTINCT p.proteome_id, e.db, e.entry_acc, e.pdb_id
    FROM pdim p JOIN epdb0 e ON e.tax_id = 'N' || p.k
  ),
  tde AS (
    SELECT b.proteome_id, m.db, m.entry_acc, b.protein_acc
    FROM pbase b JOIN pmatch m ON b.protein_acc = m.protein_acc
  ),
  entry_prot AS (
    SELECT proteome_id, db, entry_acc,
           count(DISTINCT protein_acc) AS e_proteins
    FROM tde GROUP BY 1, 2, 3
  ),
  entry_struct AS (
    SELECT proteome_id, db, entry_acc, count(DISTINCT pdb_id) AS e_structures
    FROM epdb GROUP BY 1, 2, 3
  ),
  per_entry_base AS (
    SELECT coalesce(p.proteome_id, s.proteome_id) AS proteome_id,
           coalesce(p.db, s.db) AS db,
           coalesce(p.entry_acc, s.entry_acc) AS entry_acc,
           coalesce(p.e_proteins, 0) AS num_proteins,
           coalesce(s.e_structures, 0) AS num_structures
    FROM entry_prot p
    FULL OUTER JOIN entry_struct s
      ON p.proteome_id = s.proteome_id AND p.db = s.db
     AND p.entry_acc = s.entry_acc
  )
"""


register(QuerySpec(
    name="z_proteome_per_entry",
    tags=("A8", "A2", "J1", "F8"),
    description="webfront_proteomeperentry rows (reference "
    "interpro/mysql/proteomes.py:126-139): per-(proteome, entry) protein "
    "counts full-outer-merged with structure-side entry sets, plus the "
    "{proteins, structures} counts JSON (no proteomes key, unlike the "
    "taxonomy sibling).",
    build=lambda spark, sf: _marts(spark, sf)[1],
    oracle=f"""
WITH {_SYN}
SELECT proteome_id AS accession, entry_acc,
       CAST(num_proteins AS BIGINT) AS num_proteins,
       '{{"proteins":' || num_proteins
         || ',"structures":' || num_structures || '}}' AS counts
FROM per_entry_base
    """,
))


register(QuerySpec(
    name="z_proteome_per_db",
    tags=("A8", "A2"),
    description="webfront_proteomeperentrydb rows (reference "
    "interpro/mysql/proteomes.py:145-154): per-(proteome, database) "
    "protein-once-per-db counts, merged entry counts, structure-side "
    "union sizes, and the {entries, proteins, structures} counts JSON.",
    build=lambda spark, sf: _marts(spark, sf)[2],
    oracle=f"""
WITH {_SYN},
db_entries AS (
  SELECT proteome_id, db, count(*) AS db_n_entries
  FROM per_entry_base GROUP BY 1, 2
),
db_prot AS (
  SELECT proteome_id, db, count(DISTINCT protein_acc) AS db_proteins
  FROM tde GROUP BY 1, 2
),
db_struct AS (
  SELECT proteome_id, db, count(DISTINCT pdb_id) AS db_structures
  FROM epdb GROUP BY 1, 2
)
SELECT e.proteome_id AS accession, e.db AS source_database,
       CAST(coalesce(p.db_proteins, 0) AS BIGINT) AS num_proteins,
       '{{"entries":' || e.db_n_entries
         || ',"proteins":' || coalesce(p.db_proteins, 0)
         || ',"structures":' || coalesce(s.db_structures, 0) || '}}' AS counts
FROM db_entries e
LEFT JOIN db_prot p ON e.proteome_id = p.proteome_id AND e.db = p.db
LEFT JOIN db_struct s ON e.proteome_id = s.proteome_id AND e.db = s.db
    """,
))


register(QuerySpec(
    name="z_proteome_mart",
    tags=("A8", "A2", "J2", "F8"),
    description="webfront_proteome one-row-per-proteome mart (reference "
    "interpro/mysql/proteomes.py:160-173): dim columns, member protein "
    "count, and the nested counts JSON {entries: {total, per-db}, "
    "proteins, structures} with the protein-side + entry-side structure "
    "union (mysql/proteomes.py:99-122).",
    build=lambda spark, sf: _marts(spark, sf)[0],
    oracle=f"""
WITH {_SYN},
db_entries AS (
  SELECT proteome_id, db, count(*) AS db_n_entries
  FROM per_entry_base GROUP BY 1, 2
),
entries_map AS (
  SELECT proteome_id, CAST(sum(db_n_entries) AS BIGINT) AS total_entries,
         string_agg('"' || db || '":' || db_n_entries, ',' ORDER BY db)
           AS per_db_json
  FROM db_entries GROUP BY 1
),
structs_all AS (
  SELECT proteome_id, count(*) AS n_structures FROM (
    SELECT DISTINCT b.proteome_id, ps.pdb_id
    FROM pbase b JOIN pstruct ps ON b.protein_acc = ps.protein_acc
    UNION
    SELECT DISTINCT proteome_id, pdb_id FROM epdb
  ) GROUP BY 1
)
SELECT d.proteome_id AS accession,
       'Proteome ' || d.proteome_id AS name,
       CASE WHEN d.k % 2 = 0 THEN 1 ELSE 0 END AS is_reference,
       'strain-' || d.proteome_id AS strain,
       'asm-' || d.proteome_id AS assembly,
       'N' || d.k AS taxonomy_id,
       CAST(b.n_proteins AS BIGINT) AS num_proteins,
       '{{"entries":{{"total":' || coalesce(e.total_entries, 0)
         || coalesce(',' || e.per_db_json, '')
         || '}},"proteins":' || b.n_proteins
         || ',"structures":' || coalesce(st.n_structures, 0) || '}}' AS counts
FROM pdim d
JOIN base_agg b ON d.proteome_id = b.proteome_id
LEFT JOIN entries_map e ON d.proteome_id = e.proteome_id
LEFT JOIN structs_all st ON d.proteome_id = st.proteome_id
    """,
))
