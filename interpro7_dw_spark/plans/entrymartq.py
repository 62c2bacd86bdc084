"""webfront_entry mart catalog entry (reference
interpro/mysql/entries.py:163-562): the one-row-per-entry composition
— member_databases nesting, root-based hierarchy JSON + PANTHER/CATH
subfamily counts, history blocks with lower-cased signature keys,
lower-cased cross-references merged with sorted ECs, pathways,
overlaps_with, set_info, representative-structure pick, and the
11-key counts JSON — run over bio-shaped relations synthesized
deterministically from the star schema (same pattern as marts.py), so
the REAL composition in domain/entry_mart.py sits under the hard
differential gate.

Synthesis (identical in the DuckDB CTEs):
  entries   = 45 InterPro entries IPR0..44 (parents i-i%4 for i%4 in
              (1,2); public unless i%10=7; deleted when i%10=9) +
              200 signatures SIG0..199 (db cycling 9 member DBs;
              PANTHER j%9=7 / CathGene3D j%9=5 sigs form 4-sig
              hierarchies; j%3=0 integrated into IPR(j%40); PANTHER/
              CATH children integrated into their parent signature —
              exercising the non-InterPro-target skip)
  matches   = orders: sig = o_orderkey%200, protein = o_custkey,
              taxon via customer nation, proteome = mktsegment when
              acctbal >= 0, dom orgs on even sigs, AlphaFold on even
              custkeys; each match row feeds its signature and (when
              integrated) its InterPro entry
  structures= PDB(o_orderkey%60) with coverage ((p*7+e*3)%101)/100,
              high-res dim resolution (p%35)/10 with some NULLs
  IPR-level dims: ECs (even i), pathways (i%3/i%4), IntAct rows
              (i%6+1 rows unless i%5=4), clans on SIG(j%5=0),
              overlapping pairs (IPR2k, IPR2k+1)
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.entry_mart import webfront_entry_mart
from .spec import QuerySpec, register, t

_SIG_DB = ["Pfam", "CDD", "Profiles", "SMART", "NCBIfam",
           "CathGene3D", "SSF", "PANTHER", "Hamap"]


def synth_entry_dim(spark: SparkSession):
    i = F.col("id")
    empty_s = F.expr("array()").cast("array<string>")
    empty_oi = F.expr("array()").cast("array<struct<db string, entry_acc string>>")
    empty_xr = F.expr("array()").cast("array<struct<ref_db string, ref_id string>>")
    ipr = spark.range(45).select(
        F.concat(F.lit("IPR"), i).alias("entry_acc"),
        F.concat(F.lit("Entry "), i).alias("name"),
        F.concat(F.lit("entry_"), i).alias("short_name"),
        F.element_at(
            F.array(F.lit("Family"), F.lit("Domain"), F.lit("Repeat")),
            (i % 3 + 1).cast("int"),
        ).alias("type"),
        F.lit("InterPro").alias("database"),
        F.lit(None).cast("string").alias("integrated_in"),
        F.when(
            (i % 4).isin(1, 2), F.concat(F.lit("IPR"), i - i % 4)
        ).alias("parent_acc"),
        (i % 10 != 7).alias("public"),
        F.concat(F.lit("2020-01-0"), i % 9 + 1).alias("creation_date"),
        F.when(i % 10 == 9, F.lit("2021-05-05")).alias("deletion_date"),
        F.when(
            i % 5 == 0,
            F.array(F.concat(F.lit("Old A "), i), F.concat(F.lit("Old B "), i)),
        ).otherwise(empty_s).alias("old_names"),
        F.when(i % 7 == 0, F.array(F.concat(F.lit("old_sn_"), i)))
        .otherwise(empty_s)
        .alias("old_short_names"),
        F.when(
            i % 6 == 0,
            F.expr(
                "array(struct('PFAM' as db, concat('IPR', id % 10) as entry_acc),"
                " struct('CDD' as db, concat('IPR', (id + 1) % 10) as entry_acc))"
            ),
        ).otherwise(empty_oi).alias("old_integrations"),
        F.when(
            i % 4 != 0,
            F.expr(
                "array(struct('CAZy' as ref_db, concat('GH', id % 8) as ref_id),"
                " struct('PANDIT' as ref_db, concat('PD', id) as ref_id))"
            ),
        ).otherwise(empty_xr).alias("cross_references"),
    )

    j = F.col("id")
    db = F.element_at(F.array(*[F.lit(d) for d in _SIG_DB]), (j % 9 + 1).cast("int"))
    # PANTHER (j%9=7) and CathGene3D (j%9=5) sigs form groups of 4:
    # k = ordinal within the family; k%4 != 0 -> child of the group root
    k7 = (j - 7) / F.lit(9)
    k5 = (j - 5) / F.lit(9)
    parent = F.when(
        (j % 9 == 7) & (k7.cast("long") % 4 != 0),
        F.concat(F.lit("SIG"), (F.lit(7) + 9 * (k7.cast("long") - k7.cast("long") % 4))),
    ).when(
        (j % 9 == 5) & (k5.cast("long") % 4 != 0),
        F.concat(F.lit("SIG"), (F.lit(5) + 9 * (k5.cast("long") - k5.cast("long") % 4))),
    )
    sig = spark.range(200).select(
        F.concat(F.lit("SIG"), j).alias("entry_acc"),
        F.when(j % 4 != 0, F.concat(F.lit("name "), j)).alias("name"),
        F.when(j % 5 != 0, F.concat(F.lit("sn"), j)).alias("short_name"),
        F.when(j % 9 == 7, F.lit("Family")).otherwise(F.lit("Domain")).alias("type"),
        db.alias("database"),
        # PANTHER/CATH children integrate into their parent signature
        # (skipped by member_databases); every third sig into InterPro
        F.coalesce(
            parent, F.when(j % 3 == 0, F.concat(F.lit("IPR"), j % 40))
        ).alias("integrated_in"),
        parent.alias("parent_acc"),
        F.lit(True).alias("public"),
        F.lit("2019-01-01").alias("creation_date"),
        F.lit(None).cast("string").alias("deletion_date"),
        empty_s.alias("old_names"),
        empty_s.alias("old_short_names"),
        empty_oi.alias("old_integrations"),
        empty_xr.alias("cross_references"),
    )
    return ipr.unionByName(sig)


def synth_match_facts(spark: SparkSession, sf: str):
    sig = F.col("o_orderkey") % 200
    m = (
        t(spark, sf, "orders")
        .join(
            t(spark, sf, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("o_custkey").cast("string").alias("protein_acc"),
            sig.alias("sig"),
            F.concat(F.lit("N"), F.col("c_nationkey")).alias("tax_id"),
            F.when(F.col("c_acctbal") >= 0, F.col("c_mktsegment")).alias("proteome_id"),
            F.when(sig % 2 == 0, F.concat(F.lit("DOM"), F.col("o_custkey") % 20)).alias(
                "dom_id"
            ),
            (F.col("o_custkey") % 2 == 0).alias("in_alphafold"),
        )
    )
    cols = ["protein_acc", "tax_id", "proteome_id", "dom_id", "in_alphafold"]
    rows_sig = m.select(F.concat(F.lit("SIG"), F.col("sig")).alias("entry_acc"), *cols)
    rows_ipr = m.filter(F.col("sig") % 3 == 0).select(
        F.concat(F.lit("IPR"), F.col("sig") % 40).alias("entry_acc"), *cols
    )
    return rows_sig.unionByName(rows_ipr)


def synth_entry_structures(spark: SparkSession, sf: str):
    sig = F.col("o_orderkey") % 200
    p = F.col("o_orderkey") % 60
    base = t(spark, sf, "orders").select(sig.alias("sig"), p.alias("p"))
    s_sig = base.select(
        F.concat(F.lit("SIG"), F.col("sig")).alias("entry_acc"),
        F.concat(F.lit("PDB"), F.col("p")).alias("pdb_id"),
        (((F.col("p") * 7 + F.col("sig") * 3) % 101) / F.lit(100.0)).alias("coverage"),
    ).distinct()
    s_ipr = base.filter(F.col("sig") % 3 == 0).select(
        F.concat(F.lit("IPR"), F.col("sig") % 40).alias("entry_acc"),
        F.concat(F.lit("PDB"), F.col("p")).alias("pdb_id"),
        (((F.col("p") * 7 + (F.col("sig") % 40) * 3) % 101) / F.lit(100.0)).alias(
            "coverage"
        ),
    ).distinct()
    return s_sig.unionByName(s_ipr)


def synth_structures_dim(spark: SparkSession):
    i = F.col("id")
    return spark.range(60).select(
        F.concat(F.lit("PDB"), i).alias("pdb_id"),
        F.concat(F.lit("Structure "), i).alias("s_name"),
        F.when(i % 17 != 13, (i % 35) / F.lit(10.0)).alias("resolution"),
    )


def _mart_entry(spark: SparkSession, sf: str):
    i = F.col("id")
    enzymes = (
        spark.range(45)
        .filter(i % 2 == 0)
        .select(
            F.concat(F.lit("IPR"), i).alias("entry_acc"),
            F.concat(F.lit("1.2.3."), i % 9).alias("ec"),
        )
        .unionByName(
            spark.range(45)
            .filter(i % 6 == 0)
            .select(
                F.concat(F.lit("IPR"), i).alias("entry_acc"),
                F.concat(F.lit("2.3.4."), i % 7).alias("ec"),
            )
        )
    )
    pathways = (
        spark.range(45)
        .filter(i % 3 == 0)
        .select(
            F.concat(F.lit("IPR"), i).alias("entry_acc"),
            F.lit("metacyc").alias("pathway_db"),
            F.concat(F.lit("PWY-"), i).alias("pathway_id"),
            F.concat(F.lit("Path "), i).alias("pathway_name"),
        )
        .unionByName(
            spark.range(45)
            .filter(i % 4 == 0)
            .select(
                F.concat(F.lit("IPR"), i).alias("entry_acc"),
                F.lit("Reactome").alias("pathway_db"),
                F.concat(F.lit("R-HSA-"), i).alias("pathway_id"),
                F.concat(F.lit("React "), i).alias("pathway_name"),
            )
        )
    )
    interactions = (
        spark.range(40)
        .filter(i % 5 != 4)
        .select(
            "id",
            F.explode(F.sequence(F.lit(1), (i % 6 + 1).cast("int"))).alias("k"),
        )
        .select(
            F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
            F.concat(F.lit("EBI-"), F.col("id"), F.lit("-"), F.col("k")).alias("intact_id"),
        )
    )
    clans = (
        spark.range(200)
        .filter(i % 5 == 0)
        .select(
            F.concat(F.lit("SIG"), i).alias("entry_acc"),
            F.concat(F.lit("CL"), i % 10).alias("set_acc"),
            F.concat(F.lit("Clan "), i % 10).alias("set_name"),
        )
    )
    overlapping = spark.range(10).select(
        F.concat(F.lit("IPR"), i * 2).alias("acc_1"),
        F.concat(F.lit("IPR"), i * 2 + 1).alias("acc_2"),
    )
    return webfront_entry_mart(
        synth_entry_dim(spark),
        synth_match_facts(spark, sf),
        synth_entry_structures(spark, sf),
        synth_structures_dim(spark),
        entry_enzymes=enzymes,
        entry_pathways=pathways,
        entry_interactions=interactions,
        entry_clans=clans,
        overlapping=overlapping,
    )


register(QuerySpec(
    name="mart_entry",
    tags=("X5", "G2", "A7", "A8", "F8", "F11", "J2"),
    description="webfront_entry one-row-per-entry mart (reference "
    "interpro/mysql/entries.py:163-562): member_databases nesting with the "
    "non-InterPro-target skip, root-based hierarchy JSON + PANTHER/CATH "
    "subfamily counts, history blocks (lower-cased signature keys), "
    "lower-cased cross-references merged with sorted ECs, pathways, "
    "overlaps_with, set_info, the representative-structure floor/argmax "
    "pick, and the 11-key counts JSON with jsonify empty->NULL semantics.",
    build=_mart_entry,
    oracle="""
WITH iprd AS (
  SELECT i, 'IPR' || i AS acc, 'Entry ' || i AS name, 'entry_' || i AS short_name,
         ['Family','Domain','Repeat'][CAST(i % 3 AS INT) + 1] AS typ,
         CASE WHEN i % 4 IN (1, 2) THEN i - i % 4 END AS rooti,
         i % 10 != 7 AS pub, i % 10 = 9 AS del
  FROM (SELECT unnest(generate_series(0, 44)) AS i)
),
sigd AS (
  SELECT j, 'SIG' || j AS acc,
         CASE WHEN j % 4 != 0 THEN 'name ' || j END AS name,
         CASE WHEN j % 5 != 0 THEN 'sn' || j END AS short_name,
         ['Pfam','CDD','Profiles','SMART','NCBIfam','CathGene3D','SSF','PANTHER','Hamap']
           [CAST(j % 9 AS INT) + 1] AS db,
         CASE WHEN j % 9 = 7 AND ((j - 7) // 9) % 4 != 0
                THEN 'SIG' || (7 + 9 * ((j - 7) // 9 - ((j - 7) // 9) % 4))
              WHEN j % 9 = 5 AND ((j - 5) // 9) % 4 != 0
                THEN 'SIG' || (5 + 9 * ((j - 5) // 9 - ((j - 5) // 9) % 4))
         END AS parent_acc
  FROM (SELECT unnest(generate_series(0, 199)) AS j)
),
sigd2 AS (
  SELECT *, coalesce(parent_acc,
            CASE WHEN j % 3 = 0 THEN 'IPR' || (j % 40) END) AS integrated_in
  FROM sigd
),
-- hierarchy: InterPro trees (depth 2 by construction)
kids AS (
  SELECT rooti, string_agg('{"accession":"' || acc || '","name":"' || name
           || '","type":"' || typ || '","children":[]}', ',' ORDER BY acc) AS kid_json
  FROM iprd WHERE rooti IS NOT NULL GROUP BY rooti
),
roots AS (
  SELECT d.i, '{"accession":"' || d.acc || '","name":"' || d.name || '","type":"'
           || d.typ || '","children":[' || coalesce(k.kid_json, '') || ']}' AS tree
  FROM iprd d LEFT JOIN kids k ON d.i = k.rooti WHERE d.rooti IS NULL
),
ipr_hier AS (
  SELECT d.acc, CASE WHEN d.pub AND NOT d.del THEN r.tree END AS hierarchy_json
  FROM iprd d JOIN roots r ON r.i = coalesce(d.rooti, d.i)
),
-- PANTHER/CATH subfamily counts: group = root + direct children
fam_groups AS (
  SELECT j, CASE WHEN j % 9 = 7 THEN 'p' || ((j - 7) // 9 - ((j - 7) // 9) % 4)
                 WHEN j % 9 = 5 THEN 'c' || ((j - 5) // 9 - ((j - 5) // 9) % 4)
            END AS grp
  FROM (SELECT unnest(generate_series(0, 199)) AS j) WHERE j % 9 IN (5, 7)
),
subfam AS (
  SELECT 'SIG' || g.j AS acc, CAST(cnt - 1 AS INT) AS n_subfamilies
  FROM fam_groups g JOIN (SELECT grp, count(*) AS cnt FROM fam_groups GROUP BY grp) c
    USING (grp)
),
-- member_databases: skip integrations whose target is not InterPro
msig AS (
  SELECT s.integrated_in AS acc, lower(s.db) AS mdb,
         s.acc || '=' || coalesce(s.name, s.short_name, s.acc) AS item
  FROM sigd2 s WHERE s.integrated_in LIKE 'IPR%'
),
mdb_inner AS (
  SELECT acc, mdb, string_agg(item, ',' ORDER BY item) AS accs
  FROM msig GROUP BY acc, mdb
),
mdb AS (
  SELECT acc, string_agg(mdb || ':[' || accs || ']', ';' ORDER BY mdb) AS member_databases
  FROM mdb_inner GROUP BY acc
),
-- history blocks
hist AS (
  SELECT acc, nullif(concat_ws('|',
    CASE WHEN i % 5 = 0 THEN 'names:[Old A ' || i || ';Old B ' || i || ']' END,
    CASE WHEN i % 7 = 0 THEN 'short_names:[old_sn_' || i || ']' END,
    CASE WHEN i % 6 = 0 THEN 'signatures:{cdd=IPR' || ((i + 1) % 10)
                             || ',pfam=IPR' || (i % 10) || '}' END), '') AS history
  FROM iprd
),
-- cross-references (lower-cased keys) + sorted ec family
xr_rows AS (
  SELECT acc, 'cazy' AS db, 'GH' || (i % 8) AS rid FROM iprd WHERE i % 4 != 0
  UNION ALL SELECT acc, 'pandit', 'PD' || i FROM iprd WHERE i % 4 != 0
  UNION ALL SELECT acc, 'ec', '1.2.3.' || (i % 9) FROM iprd WHERE i % 2 = 0
  UNION ALL SELECT acc, 'ec', '2.3.4.' || (i % 7) FROM iprd WHERE i % 6 = 0
),
xr_inner AS (
  SELECT acc, db, string_agg(rid, ',' ORDER BY rid) AS ids
  FROM xr_rows GROUP BY acc, db
),
xr AS (
  SELECT acc, string_agg(db || ':' || ids, ';' ORDER BY db) AS cross_refs
  FROM xr_inner GROUP BY acc
),
-- pathways
pw_rows AS (
  SELECT acc, 'metacyc' AS db, 'PWY-' || i || '=Path ' || i AS item FROM iprd WHERE i % 3 = 0
  UNION ALL SELECT acc, 'reactome', 'R-HSA-' || i || '=React ' || i FROM iprd WHERE i % 4 = 0
),
pw_inner AS (
  SELECT acc, db, string_agg(item, ',' ORDER BY item) AS items, count(*) AS n
  FROM pw_rows GROUP BY acc, db
),
pw AS (
  SELECT acc, string_agg(db || ':[' || items || ']', ';' ORDER BY db) AS pathways_str,
         CAST(sum(n) AS BIGINT) AS n_pathways
  FROM pw_inner GROUP BY acc
),
-- overlaps, both directions
ov_pairs AS (
  SELECT 'IPR' || (k * 2) AS a, 'IPR' || (k * 2 + 1) AS b
  FROM (SELECT unnest(generate_series(0, 9)) AS k)
),
ov_rows AS (
  SELECT a AS acc, b AS other FROM ov_pairs
  UNION ALL SELECT b, a FROM ov_pairs
),
ov AS (
  SELECT r.acc, string_agg(r.other || '=' || d.name || '=' || lower(d.typ),
                           ',' ORDER BY r.other || '=' || d.name || '=' || lower(d.typ))
           AS overlaps_str
  FROM ov_rows r JOIN iprd d ON r.other = d.acc
  GROUP BY r.acc
),
-- interactions / clans
ppi AS (
  SELECT acc, CAST(i % 6 + 1 AS BIGINT) AS n_interactions
  FROM iprd WHERE i < 40 AND i % 5 != 4
),
clans AS (
  SELECT 'SIG' || j AS acc, 'CL' || (j % 10) AS set_acc, 'Clan ' || (j % 10) AS set_name
  FROM (SELECT unnest(generate_series(0, 199)) AS j) WHERE j % 5 = 0
),
-- match facts (signature rows + integrated InterPro rows)
mrows0 AS (
  SELECT CAST(o_custkey AS VARCHAR) AS protein_acc,
         o_orderkey % 200 AS sig,
         'N' || c_nationkey AS tax_id,
         CASE WHEN c_acctbal >= 0 THEN c_mktsegment END AS proteome_id,
         CASE WHEN (o_orderkey % 200) % 2 = 0 THEN 'DOM' || (o_custkey % 20) END AS dom_id,
         o_custkey % 2 = 0 AS in_alphafold
  FROM orders JOIN customer ON o_custkey = c_custkey
),
mrows AS (
  SELECT 'SIG' || sig AS acc, * FROM mrows0
  UNION ALL
  SELECT 'IPR' || (sig % 40) AS acc, * FROM mrows0 WHERE sig % 3 = 0
),
agg AS (
  SELECT acc, count(*) AS n_matches,
         count(DISTINCT protein_acc) AS n_proteins,
         count(DISTINCT tax_id) AS n_taxa,
         count(DISTINCT proteome_id) AS n_proteomes,
         count(DISTINCT dom_id) AS n_dom_archs,
         count(DISTINCT protein_acc) FILTER (WHERE in_alphafold) AS n_af
  FROM mrows GROUP BY acc
),
-- structures: (pdb, coverage) tuples; repr pick with floor + argmax
srows0 AS (
  SELECT o_orderkey % 200 AS sig, o_orderkey % 60 AS p FROM orders
),
srows AS (
  SELECT DISTINCT 'SIG' || sig AS acc, 'PDB' || p AS pdb_id,
         ((p * 7 + sig * 3) % 101) / 100.0 AS coverage
  FROM srows0
  UNION
  SELECT DISTINCT 'IPR' || (sig % 40), 'PDB' || p,
         ((p * 7 + (sig % 40) * 3) % 101) / 100.0
  FROM srows0 WHERE sig % 3 = 0
),
sagg AS (
  SELECT acc, count(*) AS n_structures
  FROM (SELECT DISTINCT acc, pdb_id, coverage FROM srows) GROUP BY acc
),
highres AS (
  SELECT 'PDB' || i AS pdb_id, 'Structure ' || i AS s_name, (i % 35) / 10.0 AS resolution
  FROM (SELECT unnest(generate_series(0, 59)) AS i)
  WHERE i % 17 != 13 AND (i % 35) / 10.0 <= 2.0
),
adm AS (
  SELECT s.acc, s.pdb_id, h.s_name, s.coverage, h.resolution
  FROM srows s JOIN highres h USING (pdb_id)
  WHERE s.coverage > 0.5 OR (s.coverage = 0.5 AND h.resolution < 2.0)
),
reprs AS (
  SELECT acc, pdb_id AS repr_pdb, s_name AS repr_name
  FROM (SELECT *, row_number() OVER (PARTITION BY acc
          ORDER BY coverage DESC, resolution ASC, pdb_id DESC) AS rn FROM adm)
  WHERE rn = 1
),
-- base rows for all 245 entries
base AS (
  SELECT acc, lower(typ) AS entry_type, name, short_name,
         'interpro' AS source_database, NULL AS integrated_id,
         '2020-01-0' || (i % 9 + 1) AS creation_date,
         CASE WHEN del THEN '2021-05-05' END AS deletion_date
  FROM iprd
  UNION ALL
  SELECT acc, CASE WHEN j % 9 = 7 THEN 'family' ELSE 'domain' END,
         name, short_name, lower(db), integrated_in,
         '2019-01-01', NULL
  FROM sigd2
)
SELECT b.acc AS entry_acc, b.entry_type, b.name, b.short_name, b.source_database,
       b.integrated_id, b.creation_date, b.deletion_date,
       m.member_databases,
       ih.hierarchy_json,
       coalesce(sf.n_subfamilies, 0) AS n_subfamilies,
       h.history,
       x.cross_refs,
       p.pathways_str,
       o.overlaps_str,
       c.set_acc, c.set_name,
       r.repr_pdb, r.repr_name,
       '{"subfamilies":' || coalesce(sf.n_subfamilies, 0)
         || ',"domain_architectures":' || coalesce(a.n_dom_archs, 0)
         || ',"interactions":' || coalesce(pp.n_interactions, 0)
         || ',"matches":' || coalesce(a.n_matches, 0)
         || ',"pathways":' || coalesce(p.n_pathways, 0)
         || ',"proteins":' || coalesce(a.n_proteins, 0)
         || ',"proteomes":' || coalesce(a.n_proteomes, 0)
         || ',"sets":' || CASE WHEN c.set_acc IS NOT NULL THEN 1 ELSE 0 END
         || ',"structural_models":{"alphafold":' || coalesce(a.n_af, 0)
         || '},"structures":' || coalesce(s.n_structures, 0)
         || ',"taxa":' || coalesce(a.n_taxa, 0) || '}' AS counts_json
FROM base b
LEFT JOIN mdb m ON b.acc = m.acc
LEFT JOIN ipr_hier ih ON b.acc = ih.acc
LEFT JOIN subfam sf ON b.acc = sf.acc
LEFT JOIN hist h ON b.acc = h.acc
LEFT JOIN xr x ON b.acc = x.acc
LEFT JOIN pw p ON b.acc = p.acc
LEFT JOIN ov o ON b.acc = o.acc
LEFT JOIN clans c ON b.acc = c.acc
LEFT JOIN ppi pp ON b.acc = pp.acc
LEFT JOIN agg a ON b.acc = a.acc
LEFT JOIN sagg s ON b.acc = s.acc
LEFT JOIN reprs r ON b.acc = r.acc
    """,
))
