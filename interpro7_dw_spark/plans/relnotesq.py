"""Release-note statistics catalog entry (reference
interpro/mysql/databases.py:126-312): the full webfront_release_note
payload — per-sequence-database protein counts with the AntiFam skip
rule, InterPro entry-type breakdown, new-entry / citation / GO
summary, and the per-member-database block (signatures, integrated,
recently-integrated list, clan sets, is_new / is_updated flags) —
flattened to tall (section, key, metric, value) rows so one oracle
hash covers every block.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.stats import (
    entry_type_counts,
    interpro_release_stats,
    member_database_stats,
    sequence_database_stats,
)
from .spec import QuerySpec, register, t

# index 8 is antifam (not hamap) so the AntiFam-only skip rule fires
_DBS = ["pfam", "cdd", "profile", "smart", "ncbifam", "cathgene3d", "ssf", "panther", "antifam"]
_TYPES = ["family", "domain", "repeat", "site", "homologous_superfamily"]
_DB_ARR = "['" + "','".join(_DBS) + "']"          # DuckDB literal (1-indexed)
_TYPE_ARR = "['" + "','".join(_TYPES) + "']"
_DB_ARR_S = "array('" + "','".join(_DBS) + "')"   # Spark literal (0-indexed)
_TYPE_ARR_S = "array('" + "','".join(_TYPES) + "')"


def synth_entries(spark: SparkSession):
    ipr = spark.range(40).select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        F.lit("InterPro").alias("database"),
        F.expr(f"{_TYPE_ARR_S}[cast(id % 5 as int)]").alias("type"),
        (F.col("id") % 17 != 3).alias("public"),
        (F.col("id") % 19 == 7).alias("deleted"),
        F.lit(None).cast("string").alias("integrated_in"),
        F.col("id").alias("creation_ord"),
    )
    sig = spark.range(200).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("entry_acc"),
        F.expr(f"{_DB_ARR_S}[cast(id % 9 as int)]").alias("database"),
        F.lit("family").alias("type"),
        (F.col("id") % 23 != 5).alias("public"),
        (F.col("id") % 29 == 11).alias("deleted"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("IPR"), F.col("id") % 40)).alias(
            "integrated_in"
        ),
        (F.col("id") + 1000).alias("creation_ord"),
    )
    return ipr.unionByName(sig)


def synth_prev_public(spark: SparkSession):
    return spark.range(30).select(F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"))


def synth_prev_integrated(spark: SparkSession):
    return spark.range(200).filter(F.col("id") % 6 == 0).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("entry_acc")
    )


def synth_pubmed(spark: SparkSession):
    e = spark.range(40).filter(F.col("id") % 2 == 0)
    a = e.select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        (F.col("id") % 10 + 100).alias("pmid"),
    )
    b = e.select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        (F.col("id") % 7 + 200).alias("pmid"),
    )
    return a.unionByName(b)


def synth_go_counts(spark: SparkSession):
    return spark.range(40).select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        (F.col("id") % 4).alias("n_go"),
    )


def synth_sig_clans(spark: SparkSession):
    return spark.range(200).filter(F.col("id") % 5 == 0).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("signature_acc"),
        F.concat(F.lit("CL"), F.col("id") % 10).alias("clan_acc"),
    )


def synth_staging_dbs(spark: SparkSession):
    return spark.createDataFrame(
        [(d, d.upper() + " DB", "v2" if d == "pfam" else "v1") for d in _DBS],
        "db string, name_long string, version string",
    )


def synth_public_dbs(spark: SparkSession):
    return spark.createDataFrame(
        [(d, "v1") for d in _DBS if d != "cdd"], "db string, version string"
    )


def synth_seq_proteins(spark: SparkSession, sf: str):
    return t(spark, sf, "orders").select(
        F.concat(F.lit("P"), F.col("o_orderkey")).alias("protein_acc"),
        (F.col("o_orderstatus") == "F").alias("reviewed"),
    )


def synth_seq_matches(spark: SparkSession, sf: str):
    li = t(spark, sf, "lineitem")
    sig_num = F.col("l_partkey") % 200
    base = li.select(
        F.concat(F.lit("P"), F.col("l_orderkey")).alias("protein_acc"),
        F.expr(f"{_DB_ARR_S}[cast((l_partkey % 200) % 9 as int)]").alias("match_db"),
    )
    interpro = li.filter(sig_num % 3 == 0).select(
        F.concat(F.lit("P"), F.col("l_orderkey")).alias("protein_acc"),
        F.lit("interpro").alias("match_db"),
    )
    return base.unionByName(interpro)


def _mart_relnotes(spark: SparkSession, sf: str):
    entries = synth_entries(spark)

    seq = sequence_database_stats(
        synth_seq_proteins(spark, sf), synth_seq_matches(spark, sf)
    ).select(
        F.lit("seqdb").alias("section"),
        F.col("database").alias("key"),
        F.expr("stack(3, 'count', cast(count as string), 'hit', cast(hit as string), 'integrated', cast(integrated as string))").alias(
            "metric", "value"
        ),
    )

    types = entry_type_counts(entries).select(
        F.lit("interpro_types").alias("section"),
        F.col("entry_type").alias("key"),
        F.lit("entries").alias("metric"),
        F.col("n_entries").cast("string").alias("value"),
    )

    ipr = interpro_release_stats(
        entries,
        synth_prev_public(spark),
        entry_pubmed=synth_pubmed(spark),
        entry_go_counts=synth_go_counts(spark),
    ).select(
        F.lit("interpro").alias("section"),
        F.lit("all").alias("key"),
        F.expr(
            "stack(5, 'latest_entry', latest_entry, 'new_entries', new_entries, "
            "'n_new', cast(n_new as string), "
            "'pubmed_citations', cast(pubmed_citations as string), "
            "'interpro2go', cast(interpro2go as string))"
        ).alias("metric", "value"),
    )

    mdb = member_database_stats(
        entries,
        synth_sig_clans(spark),
        synth_staging_dbs(spark),
        synth_public_dbs(spark),
        synth_prev_integrated(spark),
    ).select(
        F.lit("member_db").alias("section"),
        F.col("db").alias("key"),
        F.expr(
            "stack(8, 'name', name, 'version', version, "
            "'signatures', cast(signatures as string), "
            "'integrated_signatures', cast(integrated_signatures as string), "
            "'recently_integrated', recently_integrated, "
            "'sets', cast(sets as string), "
            "'is_new', cast(is_new as string), "
            "'is_updated', cast(is_updated as string))"
        ).alias("metric", "value"),
    )

    cols = ["section", "key", "metric", "value"]
    return (
        seq.select(cols)
        .unionByName(types.select(cols))
        .unionByName(ipr.select(cols))
        .unionByName(mdb.select(cols))
    )


register(QuerySpec(
    name="mart_relnotes",
    tags=("A13", "A2", "A3", "A5", "U1", "P5"),
    description="Full release-note statistics payload (reference "
    "interpro/mysql/databases.py:126-312) as tall (section, key, metric, "
    "value) rows: per-seq-db protein/hit/integrated counts with the "
    "AntiFam-only skip rule, entry-type breakdown, new-entry list vs the "
    "previous release, distinct PubMed citations, InterPro2GO total, and "
    "the per-member-db block with recently-integrated lists, clan set "
    "counts and is_new/is_updated version flags.",
    build=_mart_relnotes,
    oracle=f"""
WITH ipr AS (
  SELECT 'IPR' || i AS entry_acc, {_TYPE_ARR}[CAST(i % 5 AS INT) + 1] AS typ,
         i % 17 != 3 AS public, i % 19 = 7 AS deleted, i AS creation_ord
  FROM (SELECT unnest(generate_series(0, 39)) AS i)
),
sig AS (
  SELECT 'SIG' || i AS entry_acc, {_DB_ARR}[CAST(i % 9 AS INT) + 1] AS db,
         i % 23 != 5 AS public, i % 29 = 11 AS deleted,
         CASE WHEN i % 3 = 0 THEN 'IPR' || (i % 40) END AS integrated_in,
         i AS sig_id
  FROM (SELECT unnest(generate_series(0, 199)) AS i)
),
-- seqdb block
pm AS (
  SELECT 'P' || l_orderkey AS protein_acc,
         {_DB_ARR}[CAST((l_partkey % 200) % 9 AS INT) + 1] AS match_db
  FROM lineitem
  UNION ALL
  SELECT 'P' || l_orderkey, 'interpro'
  FROM lineitem WHERE (l_partkey % 200) % 3 = 0
),
per_protein AS (
  SELECT protein_acc,
         count(DISTINCT match_db) AS n_dbs,
         bool_or(match_db = 'interpro') AS is_integrated,
         bool_and(match_db = 'antifam') AS antifam_only
  FROM pm GROUP BY protein_acc
),
pp AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 'reviewed' ELSE 'unreviewed' END AS database,
         coalesce(NOT m.antifam_only, FALSE) AS hit,
         coalesce(m.is_integrated, FALSE) AS integrated
  FROM orders LEFT JOIN per_protein m ON 'P' || o_orderkey = m.protein_acc
),
per_db AS (
  SELECT database, count(*) AS cnt,
         CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hit,
         CAST(sum(CASE WHEN hit AND integrated THEN 1 ELSE 0 END) AS BIGINT) AS integrated
  FROM pp GROUP BY database
),
seqdb AS (
  SELECT database, cnt, hit, integrated FROM per_db
  UNION ALL
  SELECT 'uniprot', sum(cnt), CAST(sum(hit) AS BIGINT), CAST(sum(integrated) AS BIGINT)
  FROM per_db
),
seqdb_rows AS (
  SELECT 'seqdb' AS section, database AS key, m.metric,
         CASE m.metric WHEN 'count' THEN CAST(cnt AS VARCHAR)
                       WHEN 'hit' THEN CAST(hit AS VARCHAR)
                       ELSE CAST(integrated AS VARCHAR) END AS value
  FROM seqdb, (SELECT unnest(['count','hit','integrated']) AS metric) m
),
-- interpro types
type_rows AS (
  SELECT 'interpro_types' AS section, typ AS key, 'entries' AS metric,
         CAST(count(*) AS VARCHAR) AS value
  FROM ipr WHERE public AND NOT deleted
  GROUP BY typ
),
-- interpro release summary
ipr_pub AS (SELECT * FROM ipr WHERE public AND NOT deleted),
new_entries AS (
  SELECT entry_acc FROM ipr_pub
  WHERE entry_acc NOT IN (SELECT 'IPR' || i FROM (SELECT unnest(generate_series(0, 29)) AS i))
),
pubmed AS (
  SELECT 'IPR' || i AS entry_acc, (i % 10 + 100) AS pmid
  FROM (SELECT unnest(generate_series(0, 39)) AS i) WHERE i % 2 = 0
  UNION ALL
  SELECT 'IPR' || i, (i % 7 + 200)
  FROM (SELECT unnest(generate_series(0, 39)) AS i) WHERE i % 2 = 0
),
gocnt AS (
  SELECT 'IPR' || i AS entry_acc, (i % 4) AS n_go
  FROM (SELECT unnest(generate_series(0, 39)) AS i)
),
ipr_rows AS (
  SELECT 'interpro' AS section, 'all' AS key, 'latest_entry' AS metric,
         (SELECT entry_acc FROM ipr_pub ORDER BY creation_ord DESC LIMIT 1) AS value
  UNION ALL
  SELECT 'interpro', 'all', 'new_entries',
         coalesce((SELECT string_agg(entry_acc, ',' ORDER BY entry_acc) FROM new_entries), '')
  UNION ALL
  SELECT 'interpro', 'all', 'n_new',
         CAST((SELECT count(*) FROM new_entries) AS VARCHAR)
  UNION ALL
  SELECT 'interpro', 'all', 'pubmed_citations',
         CAST((SELECT count(DISTINCT p.pmid) FROM ipr_pub e JOIN pubmed p ON e.entry_acc = p.entry_acc) AS VARCHAR)
  UNION ALL
  SELECT 'interpro', 'all', 'interpro2go',
         CAST((SELECT sum(g.n_go) FROM ipr_pub e JOIN gocnt g ON e.entry_acc = g.entry_acc) AS VARCHAR)
),
-- member databases
sig_pub AS (SELECT * FROM sig WHERE public AND NOT deleted AND db != 'antifam'),
clans AS (
  SELECT 'SIG' || i AS entry_acc, 'CL' || (i % 10) AS clan_acc
  FROM (SELECT unnest(generate_series(0, 199)) AS i) WHERE i % 5 = 0
),
prev_int AS (
  SELECT 'SIG' || i AS entry_acc
  FROM (SELECT unnest(generate_series(0, 199)) AS i) WHERE i % 6 = 0
),
mdb AS (
  SELECT s.db,
         count(*) AS signatures,
         CAST(sum(CASE WHEN s.integrated_in IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS integrated_signatures,
         coalesce(string_agg(
           CASE WHEN s.integrated_in IS NOT NULL
                 AND s.entry_acc NOT IN (SELECT entry_acc FROM prev_int)
                THEN s.entry_acc END, ',' ORDER BY s.entry_acc), '') AS recently_integrated,
         count(DISTINCT c.clan_acc) AS sets
  FROM sig_pub s LEFT JOIN clans c ON s.entry_acc = c.entry_acc
  GROUP BY s.db
),
mdb_full AS (
  SELECT m.*, upper(m.db) || ' DB' AS name,
         CASE WHEN m.db = 'pfam' THEN 'v2' ELSE 'v1' END AS version,
         m.db = 'cdd' AS is_new,
         m.db = 'pfam' AS is_updated
  FROM mdb m
),
mdb_rows AS (
  SELECT 'member_db' AS section, db AS key, mt.metric,
         CASE mt.metric
           WHEN 'name' THEN name
           WHEN 'version' THEN version
           WHEN 'signatures' THEN CAST(signatures AS VARCHAR)
           WHEN 'integrated_signatures' THEN CAST(integrated_signatures AS VARCHAR)
           WHEN 'recently_integrated' THEN recently_integrated
           WHEN 'sets' THEN CAST(sets AS VARCHAR)
           WHEN 'is_new' THEN CAST(is_new AS VARCHAR)
           ELSE CAST(is_updated AS VARCHAR)
         END AS value
  FROM mdb_full,
       (SELECT unnest(['name','version','signatures','integrated_signatures',
                       'recently_integrated','sets','is_new','is_updated']) AS metric) mt
)
SELECT * FROM seqdb_rows
UNION ALL SELECT * FROM type_rows
UNION ALL SELECT * FROM ipr_rows
UNION ALL SELECT * FROM mdb_rows
    """,
))
