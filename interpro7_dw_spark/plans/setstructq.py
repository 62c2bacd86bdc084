"""webfront_set / webfront_structure full-row catalog entries
(domain/set_structure_mart.py — reference interpro/mysql/clans.py and
interpro/mysql/structures.py) over the shared bio-shaped synthesis of
plans/marts.py, extended with:

  clan dims    = CL0..CL4 ('PANTHER' even / 'PFAM' odd; Pfam clans
                 carry authors, mirroring the Pfam-only columns)
  members      = the signature_clans world (sig%3==0 -> CL<sig%5>)
                 with synthetic names and integer membership scores
  alignments   = lineitem: SIG(l_partkey%50) vs SIG(l_suppkey%50),
                 integer e-value l_orderkey%97 (float-repr rendering
                 is exercised separately by the pyfloat goldens)
  structures   = PDB0..PDB29 dim rows (nullable resolution /
                 literature / secondary_structures)
  SIFTS segs   = lineitem: chain A-C by linenumber, integer bounds,
                 auth bounds NULL for l_partkey%5==0 (renders JSON
                 null, matching json.dumps)
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.set_structure_mart import set_mart, structure_mart
from .marts import (
    _SYN_CTE,
    _domorg_members,
    _matches,
    _pdb_matches,
    _proteins,
    _protein_proteomes,
    _protein_structures,
    _signature_clans,
)
from .spec import QuerySpec, register, t


def _clans_dim(spark: SparkSession):
    c = F.col("id")
    return spark.range(5).select(
        F.concat(F.lit("CL"), c).alias("clan_acc"),
        F.concat(F.lit("Clan "), c).alias("name"),
        F.concat(F.lit("Desc "), c).alias("description"),
        F.when(c % 2 == 0, "PANTHER").otherwise("PFAM").alias("database"),
        F.when(c % 2 == 1, F.concat(F.lit('["Author'), c, F.lit('"]')))
        .otherwise(F.lit("[]")).alias("authors_json"),
        F.lit("[]").alias("literature_json"),
        F.lit("[]").alias("wikipedia_json"),
    )


def _members(spark: SparkSession, sf: str):
    return _signature_clans(spark, sf).select(
        "clan_acc",
        F.col("signature_acc").alias("member_acc"),
        F.concat(F.lit("sn"), F.substring("signature_acc", 4, 10)).alias(
            "short_name"
        ),
        F.concat(F.lit("Sig "), F.substring("signature_acc", 4, 10)).alias(
            "member_name"
        ),
        (F.substring("signature_acc", 4, 10).cast("int") * 10).alias("score"),
    )


def _alignments(spark: SparkSession, sf: str):
    return t(spark, sf, "lineitem").select(
        F.concat(F.lit("SIG"), F.col("l_partkey") % 50).alias("query_acc"),
        F.concat(F.lit("SIG"), F.col("l_suppkey") % 50).alias("target_acc"),
        (F.col("l_orderkey") % 97).alias("evalue"),
    )


def _structures_dim(spark: SparkSession):
    k = F.col("id")
    return spark.range(30).select(
        F.concat(F.lit("PDB"), k).alias("pdb_id"),
        F.concat(F.lit("Structure "), k).alias("name"),
        F.when(k % 2 == 0, "X-ray").otherwise("EM").alias("experiment_type"),
        F.concat(
            F.lit("2020-01-"), F.lpad((k % 28 + 1).cast("string"), 2, "0")
        ).alias("release_date"),
        F.when(k % 5 != 0, k.cast("double") / 10.0).alias("resolution"),
        F.when(
            k % 3 != 0, F.concat(F.lit('[{"PMID":'), k, F.lit("}]"))
        ).alias("literature_json"),
        F.when(
            k % 4 != 0, F.concat(F.lit('[{"helix":'), k, F.lit("}]"))
        ).alias("secondary_structures_json"),
    )


def _segments(spark: SparkSession, sf: str):
    li = t(spark, sf, "lineitem")
    ps = F.col("l_linenumber") * 10 + F.col("l_orderkey") % 7
    pe = ps + F.col("l_partkey") % 50 + 1
    return li.select(
        F.concat(F.lit("PDB"), F.col("l_orderkey") % 30).alias("pdb_id"),
        F.col("l_suppkey").cast("string").alias("protein_acc"),
        F.expr("char(65 + l_linenumber % 3)").alias("chain"),
        ps.cast("int").alias("protein_start"),
        pe.cast("int").alias("protein_end"),
        (ps + 3).cast("int").alias("structure_start"),
        (pe + 3).cast("int").alias("structure_end"),
        F.when(F.col("l_partkey") % 5 != 0, (ps + 3).cast("int")).alias(
            "author_structure_start"
        ),
        F.when(F.col("l_partkey") % 5 != 0, (pe + 3).cast("int")).alias(
            "author_structure_end"
        ),
    )


register(QuerySpec(
    name="z_set_mart",
    tags=("X5", "G6", "A8", "J2", "F8"),
    description="webfront_set one-row-per-clan mart (reference "
    "interpro/mysql/clans.py:11-83): relationships JSON (member nodes "
    "with scores + best-e-value same-clan links, oracle/clans.py:"
    "100-162), Pfam-only authors/literature/wikipedia columns, and the "
    "counts JSON with the clan's own database key, total-last entries, "
    "and match-row protein counts (xrefs/clans.py:44-76).",
    build=lambda spark, sf: set_mart(
        _clans_dim(spark),
        _members(spark, sf),
        _alignments(spark, sf),
        _matches(spark, sf),
        _proteins(spark, sf),
        _protein_proteomes(spark, sf),
        _domorg_members(spark, sf),
        _pdb_matches(spark, sf).select("signature_acc", "pdb_id").distinct(),
    ),
    oracle=f"""
WITH {_SYN_CTE},
clans_dim AS (
  SELECT 'CL' || c AS clan_acc, 'Clan ' || c AS name, 'Desc ' || c AS description,
         CASE WHEN c % 2 = 0 THEN 'PANTHER' ELSE 'PFAM' END AS database,
         CASE WHEN c % 2 = 1 THEN '["Author' || c || '"]' ELSE '[]' END AS authors_json
  FROM unnest(generate_series(0, 4)) AS s(c)
),
members AS (
  SELECT sc.clan_acc, sc.signature_acc AS member_acc,
         CAST(replace(sc.signature_acc, 'SIG', '') AS INT) AS i
  FROM signature_clans sc
),
nodes AS (
  SELECT clan_acc,
         '[' || string_agg(
           '{{"accession":"' || member_acc || '","short_name":"sn' || i
             || '","name":"Sig ' || i || '","type":"entry","score":' || i * 10
             || '}}', ',' ORDER BY member_acc) || ']' AS nodes_json
  FROM members GROUP BY 1
),
alns AS (
  SELECT 'SIG' || (l_partkey % 50) AS query_acc,
         'SIG' || (l_suppkey % 50) AS target_acc,
         l_orderkey % 97 AS evalue
  FROM lineitem
),
pair_min AS (
  SELECT q.clan_acc, a.query_acc, a.target_acc, min(a.evalue) AS score
  FROM alns a
  JOIN signature_clans q ON a.query_acc = q.signature_acc
  JOIN signature_clans tg ON a.target_acc = tg.signature_acc
  WHERE q.clan_acc = tg.clan_acc
  GROUP BY 1, 2, 3
),
links AS (
  SELECT clan_acc,
         '[' || string_agg(
           '{{"source":"' || query_acc || '","target":"' || target_acc
             || '","score":' || score || '}}',
           ',' ORDER BY query_acc, target_acc) || ']' AS links_json
  FROM pair_min GROUP BY 1
),
cm AS (
  SELECT m.protein_acc, m.signature_acc, sc.clan_acc
  FROM matches m JOIN signature_clans sc USING (signature_acc)
),
base AS (
  SELECT cm.clan_acc,
         count(DISTINCT cm.signature_acc) AS n_entries,
         count(*) AS n_protein_matches,
         count(DISTINCT pp.proteome_id) AS n_proteomes,
         count(DISTINCT p.tax_id) AS n_taxa
  FROM cm
  JOIN proteins p ON cm.protein_acc = p.protein_acc
  LEFT JOIN protein_proteomes pp ON cm.protein_acc = pp.protein_acc
  GROUP BY 1
),
doms AS (
  SELECT cm.clan_acc, count(DISTINCT dm.dom_id) AS n_dom_orgs
  FROM cm JOIN domorg_members dm
    ON cm.protein_acc = dm.protein_acc
   AND cm.signature_acc = dm.signature_acc
  GROUP BY 1
),
structs AS (
  SELECT cs.clan_acc, count(DISTINCT es.pdb_id) AS n_structures
  FROM (SELECT DISTINCT clan_acc, signature_acc FROM cm) cs
  JOIN (SELECT DISTINCT signature_acc, pdb_id FROM pdb_matches) es
    USING (signature_acc)
  GROUP BY 1
)
SELECT d.clan_acc AS accession, d.name, d.description,
       lower(d.database) AS source_database,
       '{{"nodes":' || coalesce(n.nodes_json, '[]')
         || ',"links":' || coalesce(l.links_json, '[]') || '}}'
         AS relationships,
       d.authors_json AS authors,
       '[]' AS literature,
       '[]' AS wikipedia,
       '{{"domain_architectures":' || coalesce(dm.n_dom_orgs, 0)
         || ',"entries":{{"' || lower(d.database) || '":' || b.n_entries
         || ',"total":' || b.n_entries
         || '}},"proteins":' || b.n_protein_matches
         || ',"proteomes":' || b.n_proteomes
         || ',"structures":' || coalesce(st.n_structures, 0)
         || ',"taxa":' || b.n_taxa || '}}' AS counts
FROM clans_dim d
JOIN base b ON d.clan_acc = b.clan_acc
LEFT JOIN nodes n ON d.clan_acc = n.clan_acc
LEFT JOIN links l ON d.clan_acc = l.clan_acc
LEFT JOIN doms dm ON d.clan_acc = dm.clan_acc
LEFT JOIN structs st ON d.clan_acc = st.clan_acc
    """,
))


register(QuerySpec(
    name="mart_structure",
    tags=("X5", "A8", "J2", "F8", "O3"),
    description="webfront_structure one-row-per-PDB mart (reference "
    "interpro/mysql/structures.py:91-160): dim columns, sorted chains "
    "JSON, nested proteins JSON {protein: {chain: [segments sorted by "
    "(protein_start, protein_end)]}} with JSON-null author bounds, "
    "pass-through literature/secondary_structures, and the counts JSON "
    "in the reference's literal key order (total-first entries, "
    "proteomes before proteins, sets).",
    build=lambda spark, sf: structure_mart(
        _structures_dim(spark),
        _segments(spark, sf).select("pdb_id", "chain").distinct(),
        _segments(spark, sf),
        _pdb_matches(spark, sf),
        _signature_clans(spark, sf),
        _protein_structures(spark, sf),
        _proteins(spark, sf),
        _protein_proteomes(spark, sf),
        _domorg_members(spark, sf).select("protein_acc", "dom_id").distinct(),
    ),
    oracle=f"""
WITH {_SYN_CTE},
sdim AS (
  SELECT 'PDB' || k AS pdb_id, 'Structure ' || k AS name,
         CASE WHEN k % 2 = 0 THEN 'X-ray' ELSE 'EM' END AS experiment_type,
         '2020-01-' || lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0') AS release_date,
         CASE WHEN k % 5 <> 0 THEN k / 10.0 END AS resolution,
         CASE WHEN k % 3 <> 0 THEN '[{{"PMID":' || k || '}}]' END AS literature,
         CASE WHEN k % 4 <> 0 THEN '[{{"helix":' || k || '}}]' END AS sec_structs
  FROM unnest(generate_series(0, 29)) AS s(k)
),
segs AS (
  SELECT 'PDB' || (l_orderkey % 30) AS pdb_id,
         CAST(l_suppkey AS VARCHAR) AS protein_acc,
         chr(65 + CAST(l_linenumber % 3 AS INT)) AS chain,
         CAST(l_linenumber * 10 + l_orderkey % 7 AS INT) AS ps,
         CAST(l_linenumber * 10 + l_orderkey % 7 + l_partkey % 50 + 1 AS INT) AS pe,
         l_partkey % 5 <> 0 AS has_auth
  FROM lineitem
),
seg_level AS (
  SELECT pdb_id, protein_acc, chain,
         '[' || string_agg(
           '{{"protein_start":' || ps || ',"protein_end":' || pe
             || ',"structure_start":' || ps + 3 || ',"structure_end":' || pe + 3
             || ',"author_structure_start":'
             || CASE WHEN has_auth THEN CAST(ps + 3 AS VARCHAR) ELSE 'null' END
             || ',"author_structure_end":'
             || CASE WHEN has_auth THEN CAST(pe + 3 AS VARCHAR) ELSE 'null' END
             || '}}',
           ',' ORDER BY ps, pe, has_auth) || ']' AS segs_json
  FROM segs GROUP BY 1, 2, 3
),
chain_level AS (
  SELECT pdb_id, protein_acc,
         '{{' || string_agg('"' || chain || '":' || segs_json,
                            ',' ORDER BY chain) || '}}' AS chains_map_json
  FROM seg_level GROUP BY 1, 2
),
protein_level AS (
  SELECT pdb_id,
         '{{' || string_agg('"' || protein_acc || '":' || chains_map_json,
                            ',' ORDER BY protein_acc) || '}}' AS proteins_json
  FROM chain_level GROUP BY 1
),
chains AS (
  SELECT pdb_id,
         '[' || string_agg(DISTINCT '"' || chain || '"', ',' ORDER BY '"' || chain || '"')
             || ']' AS chains_json
  FROM segs GROUP BY 1
),
entries AS (
  SELECT pdb_id, db, count(DISTINCT signature_acc) AS n_accs
  FROM pdb_matches GROUP BY 1, 2
),
entries_j AS (
  SELECT pdb_id, CAST(sum(n_accs) AS BIGINT) AS total_entries,
         string_agg('"' || db || '":' || n_accs, ',' ORDER BY db) AS per_db_json
  FROM entries GROUP BY 1
),
nsets AS (
  SELECT pm.pdb_id, count(DISTINCT sc.clan_acc) AS n_sets
  FROM pdb_matches pm JOIN signature_clans sc USING (signature_acc)
  GROUP BY 1
),
pdm AS (
  SELECT DISTINCT protein_acc, dom_id FROM domorg_members
),
prot_side AS (
  SELECT ps.pdb_id,
         count(DISTINCT ps.protein_acc) AS n_proteins,
         count(DISTINCT p.tax_id) AS n_taxa,
         count(DISTINCT pp.proteome_id) AS n_proteomes,
         count(DISTINCT d.dom_id) AS n_dom_orgs
  FROM protein_structures ps
  JOIN proteins p ON ps.protein_acc = p.protein_acc
  LEFT JOIN protein_proteomes pp ON ps.protein_acc = pp.protein_acc
  LEFT JOIN pdm d ON ps.protein_acc = d.protein_acc
  GROUP BY 1
)
SELECT s.pdb_id AS accession, s.name, 'pdb' AS source_database,
       s.experiment_type, s.release_date, s.resolution,
       s.literature,
       coalesce(c.chains_json, '[]') AS chains,
       coalesce(pl.proteins_json, '{{}}') AS proteins,
       s.sec_structs AS secondary_structures,
       '{{"domain_architectures":' || coalesce(p.n_dom_orgs, 0)
         || ',"entries":{{"total":' || coalesce(e.total_entries, 0)
         || coalesce(',' || e.per_db_json, '')
         || '}},"proteomes":' || coalesce(p.n_proteomes, 0)
         || ',"proteins":' || coalesce(p.n_proteins, 0)
         || ',"sets":' || coalesce(n.n_sets, 0)
         || ',"taxa":' || coalesce(p.n_taxa, 0) || '}}' AS counts
FROM sdim s
JOIN entries_j e ON s.pdb_id = e.pdb_id
LEFT JOIN chains c ON s.pdb_id = c.pdb_id
LEFT JOIN protein_level pl ON s.pdb_id = pl.pdb_id
LEFT JOIN nsets n ON s.pdb_id = n.pdb_id
LEFT JOIN prot_side p ON s.pdb_id = p.pdb_id
    """,
))
