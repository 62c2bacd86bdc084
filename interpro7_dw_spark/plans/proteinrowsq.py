"""Catalog entries for the per-protein row tables
(domain/protein_rows.py — reference interpro/mysql/proteins.py) over
deterministic synth:

  feature matches = lineitem: FT<l_partkey%80> in dbcode F<l_suppkey%6>
                    (F0=Pfam-N, F1=AntiFam both excluded, F2=MobiDB-lite
                    w/ the null->Consensus default, F3=ELM name rule,
                    F4=CATH-FunFam funfam rename, F5=COILS passthrough)
  residues        = orders: S<o_orderkey%60> sites with Active/Binding
                    descriptions (every 11th null -> dropped), residue
                    letter A-D, PROSITE/SFLD databases, name fallback
                    for every 4th signature
  InterPro-N      = orders: every row one deep-learning match of
                    S<o_orderkey%40> (second fragment when %3==0);
                    traditional matches only for even order keys,
                    min-key-derived fragments, coverage margin 1.05
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.protein_rows import feature_rows, interpro_n_rows, residue_rows
from .spec import QuerySpec, register, t

_FDB = ["Pfam-N", "AntiFam", "MobiDBLt", "ELM", "CATHFunFam", "COILS"]


def _feature_matches(spark: SparkSession, sf: str):
    li = t(spark, sf, "lineitem")
    return li.select(
        (F.col("l_orderkey") % 2000).cast("string").alias("protein_acc"),
        F.concat(F.lit("F"), F.col("l_suppkey") % 6).alias("dbcode"),
        F.concat(F.lit("FT"), F.col("l_partkey") % 80).alias("accession"),
        (F.col("l_linenumber") * 7 + 1).cast("int").alias("pos_start"),
        (F.col("l_linenumber") * 7 + 1 + F.col("l_partkey") % 40)
        .cast("int")
        .alias("pos_end"),
        F.when(
            F.col("l_partkey") % 3 != 0,
            F.concat(F.lit("sf"), F.col("l_partkey") % 9),
        ).alias("seq_feature"),
    )


def _feature_dim(spark: SparkSession):
    db_map = F.array(*[F.lit(x) for x in _FDB])
    return (
        spark.range(6)
        .select(F.col("id").alias("d"))
        .crossJoin(spark.range(80).select(F.col("id").alias("a")))
        .select(
            F.concat(F.lit("F"), F.col("d")).alias("dbcode"),
            F.concat(F.lit("FT"), F.col("a")).alias("accession"),
            F.concat(F.lit("fn"), F.col("a")).alias("name"),
            F.concat(F.lit("fd"), F.col("a")).alias("description"),
            db_map[F.col("d").cast("int")].alias("database"),
            F.lit("ev").alias("evidence"),
        )
    )


def _residues(spark: SparkSession, sf: str):
    o = t(spark, sf, "orders")
    k = F.col("o_orderkey")
    return o.select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.concat(F.lit("S"), k % 60).alias("signature_acc"),
        F.when(k % 11 != 0,
               F.when(k % 2 == 0, "Active site").otherwise("Binding site"))
        .alias("description"),
        F.expr("char(65 + o_orderkey % 4)").alias("residue"),
        (k % 200 + 1).cast("int").alias("pos_start"),
        (k % 200 + 1 + k % 5).cast("int").alias("pos_end"),
    )


def _signature_dim(spark: SparkSession):
    i = F.col("id")
    return spark.range(60).select(
        F.concat(F.lit("S"), i).alias("signature_acc"),
        F.when(i % 4 != 0, F.concat(F.lit("Name"), i)).alias("name"),
        F.when(i % 2 == 0, "PROSITE").otherwise("SFLD").alias("database"),
    )


def _nest(frag_rows):
    # rows with f1s/f1e and optional f2s/f2e -> locations column
    frag1 = F.struct(
        F.col("f1s").alias("pos_start"), F.col("f1e").alias("pos_end")
    )
    frag2 = F.struct(
        F.col("f2s").alias("pos_start"), F.col("f2e").alias("pos_end")
    )
    frags = F.when(
        F.col("f2s").isNotNull(), F.array(frag1, frag2)
    ).otherwise(F.array(frag1))
    return frag_rows.select(
        "protein_acc",
        "entry_acc",
        F.array(F.struct(frags.alias("fragments"))).alias("locations"),
    )


def _toad(spark: SparkSession, sf: str):
    o = t(spark, sf, "orders")
    k = F.col("o_orderkey")
    s1 = (k % 100 + 1).cast("int")
    e1 = (k % 100 + 1 + k % 25).cast("int")
    return _nest(
        o.select(
            F.col("o_custkey").cast("string").alias("protein_acc"),
            F.concat(F.lit("S"), k % 40).alias("entry_acc"),
            s1.alias("f1s"),
            e1.alias("f1e"),
            F.when(k % 3 == 0, e1 + 5).cast("int").alias("f2s"),
            F.when(k % 3 == 0, e1 + 15).cast("int").alias("f2e"),
        )
    )


def _trad(spark: SparkSession, sf: str):
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 2 == 0)
    g = o.groupBy(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.concat(F.lit("S"), F.col("o_orderkey") % 40).alias("entry_acc"),
    ).agg(F.min("o_orderkey").alias("km"))
    return _nest(
        g.select(
            "protein_acc",
            "entry_acc",
            (F.col("km") % 90 + 1).cast("int").alias("f1s"),
            (F.col("km") % 90 + 1 + F.col("km") % 30).cast("int").alias("f1e"),
            F.lit(None).cast("int").alias("f2s"),
            F.lit(None).cast("int").alias("f2e"),
        )
    )


register(QuerySpec(
    name="z_protein_features",
    tags=("P2", "J2", "F6"),
    description="webfront_proteinfeature rows (reference "
    "interpro/mysql/proteins.py:12-85 + oracle/matches.py:547-582): "
    "feature matches joined to the broadcast feature dim with the "
    "AntiFam/Pfam-N exclusion, the MobiDB-lite null default, the ELM "
    "name rule, and the CATH-FunFam->funfam rename — a pure narrow map "
    "over the scan, no shuffle.",
    build=lambda spark, sf: feature_rows(
        _feature_matches(spark, sf), _feature_dim(spark)
    ),
    oracle="""
WITH fm AS (
  SELECT CAST(l_orderkey % 2000 AS VARCHAR) AS protein_acc,
         l_suppkey % 6 AS d,
         l_partkey % 80 AS a,
         CAST(l_linenumber * 7 + 1 AS INT) AS pos_start,
         CAST(l_linenumber * 7 + 1 + l_partkey % 40 AS INT) AS pos_end,
         CASE WHEN l_partkey % 3 <> 0 THEN 'sf' || (l_partkey % 9) END
           AS seq_feature
  FROM lineitem
),
dbs AS (
  SELECT * FROM (VALUES
    (0, 'pfam-n'), (1, 'antifam'), (2, 'mobidblt'),
    (3, 'elm'), (4, 'cathfunfam'), (5, 'coils')) AS v(d, db)
)
SELECT fm.protein_acc,
       'FT' || fm.a AS entry_acc,
       CASE WHEN dbs.db = 'cathfunfam' THEN 'funfam' ELSE dbs.db END
         AS source_database,
       fm.pos_start AS location_start,
       fm.pos_end AS location_end,
       CASE
         WHEN dbs.db = 'elm' THEN 'fn' || fm.a
         WHEN dbs.db = 'cathfunfam' THEN 'fd' || fm.a
         WHEN fm.seq_feature IS NULL AND dbs.db = 'mobidblt'
           THEN 'Consensus Disorder Prediction'
         ELSE fm.seq_feature
       END AS sequence_feature
FROM fm JOIN dbs ON fm.d = dbs.d
WHERE dbs.db NOT IN ('antifam', 'pfam-n')
    """,
))


register(QuerySpec(
    name="z_protein_residues",
    tags=("A4", "O3", "F8"),
    description="webfront_proteinresidue rows (reference "
    "interpro/mysql/proteins.py:603-663 + oracle/matches.py:415-475): "
    "per-(protein, signature, description) residue triples sorted by "
    "(start, end) and rendered as the json.dumps tuple arrays, null "
    "descriptions dropped, entry_name falling back to the accession.",
    build=lambda spark, sf: residue_rows(
        _residues(spark, sf), _signature_dim(spark)
    ),
    oracle="""
WITH r AS (
  SELECT CAST(o_custkey AS VARCHAR) AS protein_acc,
         o_orderkey % 60 AS i,
         CASE WHEN o_orderkey % 11 <> 0 THEN
           CASE WHEN o_orderkey % 2 = 0 THEN 'Active site'
                ELSE 'Binding site' END END AS description,
         chr(65 + CAST(o_orderkey % 4 AS INT)) AS residue,
         CAST(o_orderkey % 200 + 1 AS INT) AS pos_start,
         CAST(o_orderkey % 200 + 1 + o_orderkey % 5 AS INT) AS pos_end
  FROM orders
)
SELECT protein_acc,
       'S' || i AS entry_acc,
       CASE WHEN i % 4 <> 0 THEN 'Name' || i ELSE 'S' || i END AS entry_name,
       CASE WHEN i % 2 = 0 THEN 'prosite' ELSE 'sfld' END AS source_database,
       description,
       '[' || string_agg(
         '["' || residue || '",' || pos_start || ',' || pos_end || ']',
         ',' ORDER BY pos_start, pos_end, residue) || ']' AS fragments
FROM r WHERE description IS NOT NULL
GROUP BY 1, 2, 3, 4, 5
    """,
))


register(QuerySpec(
    name="z_interpro_n",
    tags=("F10", "J3", "F8"),
    description="webfront_interpro_n rows (reference "
    "interpro/mysql/proteins.py:101-177): deep-learning matches "
    "compared to traditional matches of the same signature via the "
    "no-union fragment-length coverage and the 5% preference margin; "
    "unmatched signatures preferred unconditionally; locations "
    "rendered as nested fragments JSON.",
    build=lambda spark, sf: interpro_n_rows(
        _toad(spark, sf), _trad(spark, sf)
    ),
    oracle="""
WITH toad AS (
  SELECT CAST(o_custkey AS VARCHAR) AS protein_acc,
         'S' || (o_orderkey % 40) AS entry_acc,
         CAST(o_orderkey % 100 + 1 AS INT) AS s1,
         CAST(o_orderkey % 100 + 1 + o_orderkey % 25 AS INT) AS e1,
         o_orderkey % 3 = 0 AS two
  FROM orders
),
trad AS (
  SELECT CAST(o_custkey AS VARCHAR) AS protein_acc,
         'S' || (o_orderkey % 40) AS entry_acc,
         min(o_orderkey) AS km
  FROM orders WHERE o_orderkey % 2 = 0
  GROUP BY 1, 2
),
trad_cov AS (
  SELECT protein_acc, entry_acc, CAST(km % 30 + 1 AS INT) AS trad_cov
  FROM trad
)
SELECT t.protein_acc, t.entry_acc,
       '[{"fragments":[{"start":' || t.s1 || ',"end":' || t.e1 || '}'
         || CASE WHEN t.two
              THEN ',{"start":' || t.e1 + 5 || ',"end":' || t.e1 + 15 || '}'
              ELSE '' END
         || ']}]' AS locations,
       tc.trad_cov IS NOT NULL AS in_interpro,
       CASE WHEN tc.trad_cov IS NOT NULL
            THEN (t.e1 - t.s1 + 1 + CASE WHEN t.two THEN 11 ELSE 0 END)
                 > tc.trad_cov * 1.05
            ELSE TRUE END AS is_preferred
FROM toad t
LEFT JOIN trad_cov tc
  ON t.protein_acc = tc.protein_acc AND t.entry_acc = tc.entry_acc
    """,
))
