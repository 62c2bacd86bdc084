"""Catalog entries for the IntAct PSI-MI extraction
(domain/intact.py, reference intact.py:24-133) and the AlphaFold /
BFVD model attachment (domain/alphafold.py, reference
alphafold.py:23-73, bfvd.py:9-36) over deterministic synth:

  psimi rows  = one 10-column PSI-MI-role row per order; every rule
                branch is keyed off o_orderkey residues — no-IPR rows
                (k%4==3 and k%3!=0 together), missing intact id
                (k%7==6), multi-valued interactor type (k%13==12),
                missing acc_2 (k%11==10), missing pmid (k%17==16),
                display_long vs gene-name alias (k parity / k%5)
  alphafold   = one prediction per order keyed to 'P'||custkey;
                protein key set = customers with non-negative balance
                (the KVStore KeyError-continue drop)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..domain.alphafold import alphafold_models
from ..domain.intact import interpro_interactions
from .spec import QuerySpec, register, t

# Spark-SQL expressions for the PSI-MI fixture columns; the oracle CTE
# below renders the exact same strings in DuckDB.
_PSIMI_COLS = {
    "ids_a": "'uniprotkb:P' || lpad(CAST(k % 50 AS STRING), 4, '0')"
    " || '|intact:EBI-A'",
    "ids_b": "CASE WHEN k % 11 <> 10 THEN 'uniprotkb:Q'"
    " || lpad(CAST(k % 60 AS STRING), 4, '0')"
    " ELSE 'chebi:\"CHEBI:15422\"' END",
    "aliases_a": "CASE WHEN k % 2 = 0 THEN 'psi-mi:prot_a'"
    " || CAST(k % 9 AS STRING) || '(display_long)|uniprotkb:ga'"
    " || CAST(k % 9 AS STRING) || '(gene name)'"
    " ELSE 'uniprotkb:ga' || CAST(k % 9 AS STRING) || '(gene name)' END",
    "aliases_b": "CASE WHEN k % 5 = 0 THEN 'psi-mi:prot_b'"
    " || CAST(k % 8 AS STRING) || '(display_long)'"
    " ELSE 'uniprotkb:gb' || CAST(k % 8 AS STRING) || '(gene name)' END",
    "publication_ids": "CASE WHEN k % 17 <> 16 THEN 'pubmed:'"
    " || CAST(10000 + k % 500 AS STRING) || '|mint:MINT-1'"
    " ELSE 'doi:10.1000/x' END",
    "interaction_ids": "CASE WHEN k % 7 <> 6 THEN 'intact:EBI-'"
    " || CAST(k % 100 AS STRING) || '|imex:IM-'"
    " || CAST(k % 10 AS STRING) ELSE 'imex:IM-0' END",
    "type_a": "CASE WHEN k % 13 = 12 THEN"
    " 'psi-mi:\"MI:0326\"(protein)|psi-mi:\"MI:0328\"(small molecule)'"
    " ELSE 'psi-mi:\"MI:0326\"(protein)' END",
    "type_b": "'psi-mi:\"MI:0328\"(small molecule)'",
    "feature_a": "CASE WHEN k % 4 <> 3 THEN 'binding region:IPR'"
    " || lpad(CAST(k % 37 AS STRING), 6, '0') || '(text)'"
    " ELSE 'mutation:-' END",
    "feature_b": "CASE WHEN k % 3 = 0 THEN 'sufficient binding:IPR'"
    " || lpad(CAST(k % 23 AS STRING), 6, '0') ELSE '-' END",
}


def _psimi_fixture(spark: SparkSession, sf: str) -> DataFrame:
    base = t(spark, sf, "orders").select(F.col("o_orderkey").alias("k"))
    return base.selectExpr(
        "k AS ord", *[f"{expr} AS {name}" for name, expr in _PSIMI_COLS.items()]
    )


# The same fixture strings, DuckDB-rendered (VARCHAR concat needs the
# casts; lpad is identical).
_PSIMI_CTE = """
  raw AS (
    SELECT o_orderkey AS ord,
           'uniprotkb:P' || lpad(CAST(o_orderkey % 50 AS VARCHAR), 4, '0')
             || '|intact:EBI-A' AS ids_a,
           CASE WHEN o_orderkey % 11 <> 10 THEN 'uniprotkb:Q'
                  || lpad(CAST(o_orderkey % 60 AS VARCHAR), 4, '0')
                ELSE 'chebi:"CHEBI:15422"' END AS ids_b,
           CASE WHEN o_orderkey % 2 = 0 THEN 'psi-mi:prot_a'
                  || CAST(o_orderkey % 9 AS VARCHAR)
                  || '(display_long)|uniprotkb:ga'
                  || CAST(o_orderkey % 9 AS VARCHAR) || '(gene name)'
                ELSE 'uniprotkb:ga' || CAST(o_orderkey % 9 AS VARCHAR)
                  || '(gene name)' END AS aliases_a,
           CASE WHEN o_orderkey % 5 = 0 THEN 'psi-mi:prot_b'
                  || CAST(o_orderkey % 8 AS VARCHAR) || '(display_long)'
                ELSE 'uniprotkb:gb' || CAST(o_orderkey % 8 AS VARCHAR)
                  || '(gene name)' END AS aliases_b,
           CASE WHEN o_orderkey % 17 <> 16 THEN 'pubmed:'
                  || CAST(10000 + o_orderkey % 500 AS VARCHAR)
                  || '|mint:MINT-1'
                ELSE 'doi:10.1000/x' END AS publication_ids,
           CASE WHEN o_orderkey % 7 <> 6 THEN 'intact:EBI-'
                  || CAST(o_orderkey % 100 AS VARCHAR) || '|imex:IM-'
                  || CAST(o_orderkey % 10 AS VARCHAR)
                ELSE 'imex:IM-0' END AS interaction_ids,
           CASE WHEN o_orderkey % 13 = 12 THEN
                  'psi-mi:"MI:0326"(protein)|psi-mi:"MI:0328"(small molecule)'
                ELSE 'psi-mi:"MI:0326"(protein)' END AS type_a,
           'psi-mi:"MI:0328"(small molecule)' AS type_b,
           CASE WHEN o_orderkey % 4 <> 3 THEN 'binding region:IPR'
                  || lpad(CAST(o_orderkey % 37 AS VARCHAR), 6, '0')
                  || '(text)'
                ELSE 'mutation:-' END AS feature_a,
           CASE WHEN o_orderkey % 3 = 0 THEN 'sufficient binding:IPR'
                  || lpad(CAST(o_orderkey % 23 AS VARCHAR), 6, '0')
                ELSE '-' END AS feature_b
    FROM orders
  )
"""

register(QuerySpec(
    name="z_intact_interactions",
    tags=("S6", "P3", "F7", "W1"),
    description="IntAct PSI-MI interaction extraction (reference "
    "intact.py:24-133): IPR accessions regex-scanned out of the two "
    "feature columns, interactor accession/display_long-name/"
    "single-valued-type parsing, pubmed + intact-id extraction, the "
    "all-fields-present row filter, and the per-(entry, interaction) "
    "last-row-wins dedup (dict overwrite replayed as a max-ord "
    "window). The oracle re-runs every regex in DuckDB over the "
    "identical synthesized PSI-MI rows.",
    build=lambda spark, sf: interpro_interactions(_psimi_fixture(spark, sf)),
    oracle="WITH" + _PSIMI_CTE + """,
  ex AS (
    SELECT ord,
           list_distinct(regexp_extract_all(
             feature_a || '|' || feature_b, 'IPR\\d{6}', 0)) AS accs,
           nullif(regexp_extract(interaction_ids,
             '(?i)intact:(EBI-\\d+)', 1), '') AS intact_id,
           CAST(nullif(regexp_extract(publication_ids,
             '(?i)pubmed:(\\d+)', 1), '') AS INTEGER) AS pubmed_id,
           nullif(regexp_extract(ids_a,
             '(?i)uniprotkb:([A-Z0-9]+)', 1), '') AS acc_1,
           coalesce(
             upper(nullif(regexp_extract(aliases_a,
               '(?i)psi-mi:([^(]+)\\(display_long\\)', 1), '')),
             nullif(regexp_extract(aliases_a,
               '(?i)uniprotkb:([^(|]+)', 1), '')) AS name_1,
           CASE WHEN NOT contains(type_a, '|') THEN
             nullif(regexp_extract(type_a,
               '(?i)psi-mi:"MI:\\d+"\\(([^)]+)\\)', 1), '') END AS type_1,
           nullif(regexp_extract(ids_b,
             '(?i)uniprotkb:([A-Z0-9]+)', 1), '') AS acc_2,
           coalesce(
             upper(nullif(regexp_extract(aliases_b,
               '(?i)psi-mi:([^(]+)\\(display_long\\)', 1), '')),
             nullif(regexp_extract(aliases_b,
               '(?i)uniprotkb:([^(|]+)', 1), '')) AS name_2,
           CASE WHEN NOT contains(type_b, '|') THEN
             nullif(regexp_extract(type_b,
               '(?i)psi-mi:"MI:\\d+"\\(([^)]+)\\)', 1), '') END AS type_2
    FROM raw
  ),
  flat AS (
    SELECT unnest(accs) AS entry_acc, intact_id, pubmed_id,
           acc_1, name_1, type_1, acc_2, name_2, type_2, ord
    FROM ex
    WHERE len(accs) > 0 AND intact_id IS NOT NULL
      AND pubmed_id IS NOT NULL AND acc_1 IS NOT NULL
      AND name_1 IS NOT NULL AND type_1 IS NOT NULL
      AND acc_2 IS NOT NULL AND name_2 IS NOT NULL
      AND type_2 IS NOT NULL
  )
  SELECT entry_acc, intact_id, pubmed_id,
         acc_1, name_1, type_1, acc_2, name_2, type_2
  FROM flat
  QUALIFY row_number() OVER (
    PARTITION BY entry_acc, intact_id ORDER BY ord DESC) = 1
""",
))


def _af_preds(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("o_orderkey")
    return t(spark, sf, "orders").select(
        F.concat(F.lit("P"), F.col("o_custkey").cast("string")).alias(
            "protein_acc"
        ),
        F.concat(F.lit("AF-"), k.cast("string"), F.lit("-F1")).alias(
            "model_id"
        ),
        (F.lit(50.0) + (k % 500).cast("double") / F.lit(10.0)).alias("score"),
    )


def _af_proteins(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "customer")
        .where(F.col("c_acctbal") >= 0)
        .select(
            F.concat(F.lit("P"), F.col("c_custkey").cast("string")).alias(
                "protein_acc"
            )
        )
    )


register(QuerySpec(
    name="z_alphafold_models",
    tags=("S4", "J4", "A4", "O3"),
    description="AlphaFold/BFVD model attachment (reference "
    "alphafold.py:23-73, bfvd.py:9-36): predictions semi-joined to "
    "the protein key set (KeyError-continue), per-protein models "
    "sorted ascending by (score, model_id), rendered as a JSON list, "
    "with the default-mode keep flag (exactly one model — the "
    "fragment drop / BFVD single-structure rule) as a column so both "
    "keep_fragments branches are value-checked in one relation.",
    build=lambda spark, sf: alphafold_models(
        _af_preds(spark, sf), _af_proteins(spark, sf), keep_fragments=True
    ).withColumn("kept_default", F.col("n_models") == 1),
    oracle="""
        WITH preds AS (
          SELECT 'P' || CAST(o_custkey AS VARCHAR) AS protein_acc,
                 'AF-' || CAST(o_orderkey AS VARCHAR) || '-F1' AS model_id,
                 50.0 + CAST(o_orderkey % 500 AS DOUBLE) / 10.0 AS score
          FROM orders
        ),
        prot AS (
          SELECT 'P' || CAST(c_custkey AS VARCHAR) AS protein_acc
          FROM customer WHERE c_acctbal >= 0
        )
        SELECT p.protein_acc,
               CAST(count(*) AS BIGINT) AS n_models,
               '[' || string_agg(
                 '["' || model_id || '",' || CAST(score AS VARCHAR) || ']',
                 ',' ORDER BY score, model_id) || ']' AS models_json,
               count(*) = 1 AS kept_default
        FROM preds p JOIN prot USING (protein_acc)
        GROUP BY p.protein_acc
    """,
))
