"""Catalog entries for the remaining webfront row tables
(domain/entry_rows.py) over deterministic synth:

  varsplic       = the mart_isoforms master world (VARSPLIC x uniparc
                   crc64) + per-(isoform, signature) merged location
                   lists and a 50-signature dim (integrated every
                   third, Domain/Family, PFAM/PROSITE)
  entrytaxa      = IPR0..IPR19 (every 5th deleted, every 7th
                   non-public) left-joined to trees for every 3rd
  entryannotation= the mart_pfam_alignments seed/full fan-out + logo
                   rows for every 4th family, duplicated onto the
                   integrated InterPro accession (every 3rd family)
  database       = DB0..DB3 dim + distinct signature counts
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.entry_rows import (
    database_rows,
    entryannotation_rows,
    entrytaxa_rows,
    varsplic_rows,
)
from .marts import _pfam_a, _uniparc_seqs, _variants
from .spec import QuerySpec, register, t

_ISO_MASTER_CTE = """
  variants AS (
    SELECT CAST(c_custkey AS VARCHAR) AS protein_acc,
           1 + c_custkey % 3 AS variant,
           100 + c_custkey % 50 AS length,
           'CRC' || (c_custkey % 120) AS crc64
    FROM customer
  ),
  uniparc AS (
    SELECT 'CRC' || i AS crc64,
           CASE WHEN i % 2 = 0 THEN 'S' || i END AS seq_short,
           'L' || i AS seq_long
    FROM unnest(generate_series(0, 79)) AS s(i)
  ),
  master AS (
    SELECT v.protein_acc || '-' || v.variant AS accession,
           v.protein_acc AS protein, v.length,
           coalesce(u.seq_short, u.seq_long) AS sequence
    FROM variants v JOIN uniparc u USING (crc64)
  )
"""


def _iso_master(spark: SparkSession, sf: str):
    from ..domain.isoforms import isoform_master

    return isoform_master(_variants(spark, sf), _uniparc_seqs(spark, sf))


def _iso_sig_dim(spark: SparkSession):
    i = F.col("id")
    return spark.range(50).select(
        F.concat(F.lit("SIG"), i).alias("signature_acc"),
        F.when(i % 3 == 0, F.concat(F.lit("IPR"), i % 10)).alias("integrated"),
        F.concat(F.lit("Sig"), i).alias("name"),
        F.when(i % 2 == 0, "Domain").otherwise("Family").alias("type"),
        F.when(i % 2 == 0, "PFAM").otherwise("PROSITE").alias("database"),
    )


def _iso_matches(spark: SparkSession, sf: str):
    k = F.col("o_orderkey")
    vm = t(spark, sf, "orders").select(
        F.concat_ws(
            "-", F.col("o_custkey").cast("string"),
            (F.lit(1) + k % 4).cast("string"),
        ).alias("accession"),
        F.concat(F.lit("SIG"), k % 50).alias("signature_acc"),
        (k % 90 + 1).cast("int").alias("s"),
        (k % 90 + 11).cast("int").alias("e"),
    )
    return (
        vm.join(F.broadcast(_iso_sig_dim(spark)), "signature_acc")
        .groupBy("accession", "signature_acc", "integrated", "name",
                 "type", "database")
        .agg(
            F.concat(
                F.lit("["),
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct(s, e))),"
                    " x -> concat('{\"start\":', x.s, ',\"end\":', x.e, '}')), ',')"
                ),
                F.lit("]"),
            ).alias("locations_json")
        )
    )


def _entries_dim(spark: SparkSession):
    k = F.col("id")
    return spark.range(20).select(
        F.concat(F.lit("IPR"), k).alias("entry_acc"),
        F.when(k % 5 == 0, "2020-01-01").alias("deletion_date"),
        (k % 7 != 0).alias("public"),
    )


def _trees(spark: SparkSession):
    k = F.col("id")
    return (
        spark.range(20)
        .filter(k % 3 == 0)
        .select(
            F.concat(F.lit("IPR"), k).alias("entry_acc"),
            F.concat(F.lit('{"id":"root","count":'), k, F.lit("}")).alias(
                "tree_json"
            ),
        )
    )


def _annotations(spark: SparkSession, sf: str):
    from ..domain.pfam import pfam_alignments

    alns = pfam_alignments(_pfam_a(spark, sf)).select(
        "accession",
        F.col("aln_type").alias("anno_type"),
        F.col("alignment").alias("value"),
        F.col("n_sequences").alias("num_sequences"),
    )
    logos = (
        t(spark, sf, "part")
        .filter(F.col("p_partkey") % 4 == 0)
        .select(
            F.concat(F.lit("PF"), F.col("p_partkey")).alias("accession"),
            F.lit("logo").alias("anno_type"),
            F.encode(
                F.concat(F.lit('{"logo":'), F.col("p_partkey"), F.lit("}")),
                "utf-8",
            ).alias("value"),
            F.lit(None).cast("long").alias("num_sequences"),
        )
    )
    return alns.unionByName(logos)


def _pfam2interpro(spark: SparkSession, sf: str):
    return (
        t(spark, sf, "part")
        .filter(F.col("p_partkey") % 3 == 0)
        .select(
            F.concat(F.lit("PF"), F.col("p_partkey")).alias("accession"),
            F.concat(F.lit("IPR"), F.col("p_partkey") % 10).alias(
                "interpro_acc"
            ),
        )
    )


def _db_dim(spark: SparkSession):
    d = F.col("id")
    return spark.range(4).select(
        F.concat(F.lit("DB"), d).alias("db_key"),
        F.concat(F.lit("Database "), d).alias("db_name"),
        F.concat(F.lit("Desc "), d).alias("description"),
        F.when(d < 3, "entry").otherwise("feature").alias("db_type"),
        F.concat(F.lit("v"), d, F.lit(".1")).alias("version"),
        F.concat(F.lit("2024-0"), d + 1, F.lit("-01")).alias("release_date"),
        F.concat(F.lit("v"), d, F.lit(".0")).alias("prev_version"),
        F.concat(F.lit("2023-0"), d + 1, F.lit("-01")).alias(
            "prev_release_date"
        ),
    )


def _db_entries(spark: SparkSession, sf: str):
    sig = F.col("o_orderkey") % 50
    return t(spark, sf, "orders").select(
        F.concat(F.lit("SIG"), sig).alias("entry_acc"),
        F.concat(F.lit("DB"), sig % 4).alias("db_key"),
    )


register(QuerySpec(
    name="z_varsplic_rows",
    tags=("F8", "A4", "J3"),
    description="webfront_varsplic rows (reference interpro/mysql/"
    "proteins.py:203-268): isoform master rows with the features JSON "
    "keyed by matched signature ({accession, integrated, name, type, "
    "source_database, locations} values, null integrated rendered as "
    "JSON null, matchless isoforms NULL via jsonify empty->NULL).",
    build=lambda spark, sf: varsplic_rows(
        _iso_master(spark, sf), _iso_matches(spark, sf)
    ),
    oracle=f"""
WITH {_ISO_MASTER_CTE},
sig_dim AS (
  SELECT 'SIG' || i AS signature_acc,
         CASE WHEN i % 3 = 0 THEN 'IPR' || (i % 10) END AS integrated,
         'Sig' || i AS name,
         CASE WHEN i % 2 = 0 THEN 'domain' ELSE 'family' END AS type_l,
         CASE WHEN i % 2 = 0 THEN 'pfam' ELSE 'prosite' END AS db_l
  FROM unnest(generate_series(0, 49)) AS s(i)
),
vm AS (
  SELECT CAST(o_custkey AS VARCHAR) || '-' || (1 + o_orderkey % 4)
           AS accession,
         'SIG' || (o_orderkey % 50) AS signature_acc,
         CAST(o_orderkey % 90 + 1 AS INT) AS s,
         CAST(o_orderkey % 90 + 11 AS INT) AS e
  FROM orders
),
merged AS (
  SELECT vm.accession, vm.signature_acc, sd.integrated, sd.name,
         sd.type_l, sd.db_l,
         '[' || string_agg('{{"start":' || s || ',"end":' || e || '}}',
                           ',' ORDER BY s, e) || ']' AS locations_json
  FROM vm JOIN sig_dim sd USING (signature_acc)
  GROUP BY 1, 2, 3, 4, 5, 6
),
feats AS (
  SELECT accession,
         '{{' || string_agg(
           '"' || signature_acc || '":{{"accession":"' || signature_acc
             || '","integrated":'
             || coalesce('"' || integrated || '"', 'null')
             || ',"name":"' || name || '","type":"' || type_l
             || '","source_database":"' || db_l
             || '","locations":' || locations_json || '}}',
           ',' ORDER BY signature_acc) || '}}' AS features
  FROM merged GROUP BY 1
)
SELECT m.accession, m.protein AS protein_acc, m.length, m.sequence,
       f.features
FROM master m LEFT JOIN feats f USING (accession)
    """,
))


register(QuerySpec(
    name="z_entrytaxa_rows",
    tags=("J3", "P2"),
    description="webfront_entrytaxa rows (reference interpro/mysql/"
    "entries.py:524-562): public non-deleted entries left-joined to "
    "their taxon-distribution tree JSON, explicit NULL trees for "
    "entries without xrefs.",
    build=lambda spark, sf: entrytaxa_rows(_entries_dim(spark), _trees(spark)),
    oracle="""
WITH entries AS (
  SELECT 'IPR' || k AS entry_acc,
         CASE WHEN k % 5 = 0 THEN '2020-01-01' END AS deletion_date,
         k % 7 <> 0 AS public,
         k
  FROM unnest(generate_series(0, 19)) AS s(k)
),
trees AS (
  SELECT 'IPR' || k AS entry_acc,
         '{"id":"root","count":' || k || '}' AS tree_json
  FROM unnest(generate_series(0, 19)) AS s(k) WHERE k % 3 = 0
)
SELECT e.entry_acc AS accession, t.tree_json AS tree
FROM entries e LEFT JOIN trees t USING (entry_acc)
WHERE e.deletion_date IS NULL AND e.public
    """,
))


register(QuerySpec(
    name="z_entryannotation_rows",
    tags=("U1", "J2", "F3"),
    description="webfront_entryannotation rows (reference interpro/"
    "mysql/entries.py:17-80): seed/full alignment + logo annotations "
    "with the logo->application/json mime rule and the Pfam->InterPro "
    "duplication of alignment rows for integrated signatures (binary "
    "payloads verified by md5 + length).",
    build=lambda spark, sf: entryannotation_rows(
        _annotations(spark, sf), _pfam2interpro(spark, sf)
    ).select(
        "accession", "type", F.md5("value").alias("value_md5"),
        F.length("value").alias("n_bytes"), "mime_type", "num_sequences",
    ),
    oracle="""
WITH pfam_a AS (
  SELECT p_partkey AS k, 'PF' || p_partkey AS accession,
         p_name AS seed_aln, p_size AS seed_num,
         p_name || '|' || p_brand AS full_aln, p_size * 3 AS full_num
  FROM part
),
ann AS (
  SELECT k, accession, 'alignment:seed' AS type, seed_aln AS value,
         seed_num AS num_sequences
  FROM pfam_a
  UNION ALL
  SELECT k, accession, 'alignment:full', full_aln, full_num FROM pfam_a
  UNION ALL
  SELECT k, accession, 'logo', '{"logo":' || k || '}', NULL
  FROM pfam_a WHERE k % 4 = 0
),
p2i AS (
  SELECT 'PF' || p_partkey AS accession,
         'IPR' || (p_partkey % 10) AS interpro_acc
  FROM part WHERE p_partkey % 3 = 0
),
unioned AS (
  SELECT accession, type, value, num_sequences FROM ann
  UNION ALL
  SELECT p.interpro_acc, a.type, a.value, a.num_sequences
  FROM ann a JOIN p2i p USING (accession)
  WHERE a.type LIKE 'alignment:%'
)
SELECT accession, type, md5(value) AS value_md5,
       octet_length(CAST(value AS BLOB)) AS n_bytes,
       CASE WHEN type = 'logo' THEN 'application/json'
            ELSE 'application/gzip' END AS mime_type,
       num_sequences
FROM unioned
    """,
))


register(QuerySpec(
    name="z_database_mart",
    tags=("A5", "J3", "P1"),
    description="webfront_database rows (reference interpro/mysql/"
    "databases.py:11-64): the database dim projected to the webfront "
    "column set with current + previous release and distinct entry "
    "counts per database.",
    build=lambda spark, sf: database_rows(
        _db_dim(spark), _db_entries(spark, sf)
    ),
    oracle="""
WITH dbs AS (
  SELECT 'DB' || d AS db_key, 'Database ' || d AS db_name,
         'Desc ' || d AS description,
         CASE WHEN d < 3 THEN 'entry' ELSE 'feature' END AS db_type,
         'v' || d || '.1' AS version,
         '2024-0' || (d + 1) || '-01' AS release_date,
         'v' || d || '.0' AS prev_version,
         '2023-0' || (d + 1) || '-01' AS prev_release_date
  FROM unnest(generate_series(0, 3)) AS s(d)
),
counts AS (
  SELECT 'DB' || ((o_orderkey % 50) % 4) AS db_key,
         count(DISTINCT 'SIG' || (o_orderkey % 50)) AS num_entries
  FROM orders GROUP BY 1
)
SELECT lower(d.db_key) AS name, d.db_key AS name_alt,
       d.db_name AS name_long, d.description, d.db_type AS type,
       CAST(coalesce(c.num_entries, 0) AS BIGINT) AS num_entries,
       d.version, d.release_date, d.prev_version, d.prev_release_date
FROM dbs d LEFT JOIN counts c USING (db_key)
    """,
))
