"""webfront_taxonomy mart-family catalog entries (domain/
taxonomy_mart.py — reference interpro/mysql/taxa.py:11-198) over a
ROOT -> region -> nation taxonomy:

  taxa          = ROOT ('no rank') / R<k> ('superkingdom', parent
                  ROOT) / N<k> ('species', parent = nation's region)
  protein facts = customers at their nation taxon; matches from
                  orders (SIG(o_orderkey%50) in DB(sig%4)); PDB
                  cross-references PDB(o_orderkey%30); proteome =
                  mktsegment when acctbal >= 0
  entry-side structures (structure-level matches at the STRUCTURE's
                  taxon) = suppliers: N<s_nationkey> x SIG(s_suppkey
                  %50) x PDB(s_suppkey%30) — merged with the protein
                  side exactly like mysql/taxa.py:87-126
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.taxonomy_mart import taxonomy_marts
from .spec import QuerySpec, register, t


def synth_taxa_dim(spark: SparkSession, sf: str):
    root = spark.range(1).select(
        F.lit("ROOT").alias("tax_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.lit("no rank").alias("rank"),
        F.lit("Sci ROOT").alias("sci_name"),
        F.lit("Full ROOT").alias("full_name"),
    )
    region = t(spark, sf, "region").select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("tax_id"),
        F.lit("ROOT").alias("parent_id"),
        F.lit("superkingdom").alias("rank"),
        F.concat(F.lit("Sci R"), F.col("r_regionkey")).alias("sci_name"),
        F.concat(F.lit("Full R"), F.col("r_regionkey")).alias("full_name"),
    )
    nation = t(spark, sf, "nation").select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("tax_id"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("parent_id"),
        F.lit("species").alias("rank"),
        F.concat(F.lit("Sci N"), F.col("n_nationkey")).alias("sci_name"),
        F.concat(F.lit("Full N"), F.col("n_nationkey")).alias("full_name"),
    )
    return root.unionByName(region).unionByName(nation)


def _facts(spark: SparkSession, sf: str):
    protein_base = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("protein_acc"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("tax_id"),
        F.when(F.col("c_acctbal") >= 0, F.col("c_mktsegment")).alias("proteome_id"),
    )
    sig = F.col("o_orderkey") % 50
    protein_matches = t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.concat(F.lit("DB"), sig % 4).alias("db"),
        F.concat(F.lit("SIG"), sig).alias("entry_acc"),
    )
    protein_structures = (
        t(spark, sf, "orders")
        .select(
            F.col("o_custkey").cast("string").alias("protein_acc"),
            F.concat(F.lit("PDB"), F.col("o_orderkey") % 30).alias("pdb_id"),
        )
        .distinct()
    )
    ssig = F.col("s_suppkey") % 50
    entry_pdb = (
        t(spark, sf, "supplier")
        .select(
            F.concat(F.lit("N"), F.col("s_nationkey")).alias("tax_id"),
            F.concat(F.lit("DB"), ssig % 4).alias("db"),
            F.concat(F.lit("SIG"), ssig).alias("entry_acc"),
            F.concat(F.lit("PDB"), F.col("s_suppkey") % 30).alias("pdb_id"),
        )
        .distinct()
    )
    return protein_base, protein_matches, protein_structures, entry_pdb


def _marts(spark: SparkSession, sf: str):
    return taxonomy_marts(synth_taxa_dim(spark, sf), *_facts(spark, sf))


_SYN = """
  anc AS (
    SELECT 'N' || n_nationkey AS tax_id, a.anc
    FROM nation, LATERAL unnest(['N' || n_nationkey, 'R' || n_regionkey, 'ROOT']) AS a(anc)
    UNION ALL
    SELECT 'R' || r_regionkey, a.anc
    FROM region, LATERAL unnest(['R' || r_regionkey, 'ROOT']) AS a(anc)
    UNION ALL
    SELECT 'ROOT', 'ROOT'
  ),
  pbase AS (
    SELECT CAST(c_custkey AS VARCHAR) AS protein_acc,
           'N' || c_nationkey AS tax_id,
           CASE WHEN c_acctbal >= 0 THEN c_mktsegment END AS proteome_id
    FROM customer
  ),
  spine AS (
    SELECT a.anc AS tax_id, p.protein_acc, p.proteome_id
    FROM pbase p JOIN anc a ON p.tax_id = a.tax_id
  ),
  base_agg AS (
    SELECT tax_id, count(*) AS n_proteins,
           count(DISTINCT proteome_id) AS n_proteomes
    FROM spine GROUP BY 1
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
    SELECT DISTINCT a.anc AS tax_id, e.db, e.entry_acc, e.pdb_id
    FROM epdb0 e JOIN anc a ON e.tax_id = a.tax_id
  ),
  tde AS (
    SELECT s.tax_id, m.db, m.entry_acc, s.protein_acc
    FROM spine s JOIN pmatch m ON s.protein_acc = m.protein_acc
  ),
  entry_prot AS (
    SELECT tax_id, db, entry_acc, count(DISTINCT protein_acc) AS e_proteins
    FROM tde GROUP BY 1, 2, 3
  ),
  entry_struct AS (
    SELECT tax_id, db, entry_acc, count(DISTINCT pdb_id) AS e_structures
    FROM epdb GROUP BY 1, 2, 3
  ),
  per_entry_base AS (
    SELECT coalesce(p.tax_id, s.tax_id) AS tax_id,
           coalesce(p.db, s.db) AS db,
           coalesce(p.entry_acc, s.entry_acc) AS entry_acc,
           coalesce(p.e_proteins, 0) AS num_proteins,
           coalesce(s.e_structures, 0) AS num_structures
    FROM entry_prot p
    FULL OUTER JOIN entry_struct s
      ON p.tax_id = s.tax_id AND p.db = s.db AND p.entry_acc = s.entry_acc
  )
"""


register(QuerySpec(
    name="z_taxonomy_per_entry",
    tags=("A8", "A9", "J1", "F8"),
    description="webfront_taxonomyperentry rows (reference "
    "interpro/mysql/taxa.py:135-147): per-(taxon, entry) subtree protein "
    "counts full-outer-merged with the structure-side entry sets, plus "
    "the {proteomes, proteins, structures} counts JSON.",
    build=lambda spark, sf: _marts(spark, sf)[1],
    oracle=f"""
WITH {_SYN}
SELECT e.tax_id, e.entry_acc, CAST(e.num_proteins AS BIGINT) AS num_proteins,
       '{{"proteomes":' || coalesce(b.n_proteomes, 0)
         || ',"proteins":' || e.num_proteins
         || ',"structures":' || e.num_structures || '}}' AS counts
FROM per_entry_base e LEFT JOIN base_agg b ON e.tax_id = b.tax_id
    """,
))


register(QuerySpec(
    name="z_taxonomy_per_db",
    tags=("A8", "A9", "A2"),
    description="webfront_taxonomyperentrydb rows (reference "
    "interpro/mysql/taxa.py:149-163): per-(taxon, database) "
    "protein-once-per-db counts, merged entry counts, structure-side "
    "union sizes, and the counts JSON.",
    build=lambda spark, sf: _marts(spark, sf)[2],
    oracle=f"""
WITH {_SYN},
db_entries AS (
  SELECT tax_id, db, count(*) AS db_n_entries FROM per_entry_base GROUP BY 1, 2
),
db_prot AS (
  SELECT tax_id, db, count(DISTINCT protein_acc) AS db_proteins
  FROM tde GROUP BY 1, 2
),
db_struct AS (
  SELECT tax_id, db, count(DISTINCT pdb_id) AS db_structures
  FROM epdb GROUP BY 1, 2
)
SELECT e.tax_id, e.db AS source_database,
       CAST(coalesce(p.db_proteins, 0) AS BIGINT) AS num_proteins,
       '{{"entries":' || e.db_n_entries
         || ',"proteomes":' || coalesce(b.n_proteomes, 0)
         || ',"proteins":' || coalesce(p.db_proteins, 0)
         || ',"structures":' || coalesce(s.db_structures, 0) || '}}' AS counts
FROM db_entries e
LEFT JOIN db_prot p ON e.tax_id = p.tax_id AND e.db = p.db
LEFT JOIN db_struct s ON e.tax_id = s.tax_id AND e.db = s.db
LEFT JOIN base_agg b ON e.tax_id = b.tax_id
    """,
))


register(QuerySpec(
    name="mart_taxonomy",
    tags=("A8", "A9", "G1", "F12", "F8"),
    description="webfront_taxonomy one-row-per-taxon mart (reference "
    "interpro/mysql/taxa.py:164-183): space-framed lineage string, "
    "parent/rank, sorted children JSON (NULL for leaves, jsonify "
    "empty->NULL), subtree protein counts, and the nested counts JSON "
    "{entries: {total, per-db}, proteomes, proteins, structures} with "
    "the protein-side + entry-side structure union.",
    build=lambda spark, sf: _marts(spark, sf)[0],
    oracle=f"""
WITH {_SYN},
taxa AS (
  SELECT 'ROOT' AS tax_id, NULL AS parent_id, 'no rank' AS rank,
         ' ROOT ' AS lineage_str
  UNION ALL
  SELECT 'R' || r_regionkey, 'ROOT', 'superkingdom',
         ' ROOT R' || r_regionkey || ' '
  FROM region
  UNION ALL
  SELECT 'N' || n_nationkey, 'R' || n_regionkey, 'species',
         ' ROOT R' || n_regionkey || ' N' || n_nationkey || ' '
  FROM nation
),
children AS (
  SELECT parent_id AS tax_id,
         '[' || string_agg('"' || tax_id || '"', ',' ORDER BY tax_id) || ']' AS children_json
  FROM taxa WHERE parent_id IS NOT NULL GROUP BY parent_id
),
db_entries AS (
  SELECT tax_id, db, count(*) AS db_n_entries FROM per_entry_base GROUP BY 1, 2
),
entries_map AS (
  SELECT tax_id, CAST(sum(db_n_entries) AS BIGINT) AS total_entries,
         string_agg('"' || db || '":' || db_n_entries, ',' ORDER BY db) AS per_db_json
  FROM db_entries GROUP BY 1
),
structs_all AS (
  SELECT tax_id, count(*) AS n_structures FROM (
    SELECT DISTINCT s.tax_id, ps.pdb_id
    FROM spine s JOIN pstruct ps ON s.protein_acc = ps.protein_acc
    UNION
    SELECT DISTINCT tax_id, pdb_id FROM epdb
  ) GROUP BY 1
)
SELECT x.tax_id, 'Sci ' || x.tax_id AS sci_name, 'Full ' || x.tax_id AS full_name,
       x.lineage_str, x.parent_id, x.rank,
       c.children_json,
       CAST(b.n_proteins AS BIGINT) AS num_proteins,
       '{{"entries":{{"total":' || coalesce(e.total_entries, 0)
         || coalesce(',' || e.per_db_json, '')
         || '}},"proteomes":' || b.n_proteomes
         || ',"proteins":' || b.n_proteins
         || ',"structures":' || coalesce(st.n_structures, 0) || '}}' AS counts
FROM taxa x
JOIN base_agg b ON x.tax_id = b.tax_id
LEFT JOIN children c ON x.tax_id = c.tax_id
LEFT JOIN entries_map e ON x.tax_id = e.tax_id
LEFT JOIN structs_all st ON x.tax_id = st.tax_id
    """,
))
