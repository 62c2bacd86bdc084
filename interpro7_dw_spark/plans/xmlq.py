"""XML composition catalog entry: the uniparc_match ``<protein>``
element builder (domain/xmldocs.py::uniparc_protein_xml — reference
interpro/ftp/uniparc.py:60-125) run over star-synthesized matches and
value-checked against a DuckDB oracle that assembles the same bytes
with string concatenation — attribute order, PIRSR drop, model
fallback, ipr child, optional fragments, and the HAMAP/PROSITE
alignment-vs-sequence-feature attribute naming all hash-gated.

Scores are drawn from quarters ((k % 8) / 4.0) so Python ``str()``
and SQL decimal rendering agree byte-wise; the scientific-notation
cases of the score formatter are covered by tests/test_pyfloat.py and
the match_complete byte goldens.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.xmldocs import uniparc_protein_xml
from .spec import QuerySpec, register, t

_LIBS = ["Pfam", "HAMAP", "PIRSR", "CDD", "PROSITE profiles",
         "SMART", "NCBIfam", "PANTHER", "SSF"]


def synth_uniparc_proteins(spark: SparkSession, sf: str):
    return t(spark, sf, "customer").select(
        F.concat(F.lit("UPI"), F.col("c_custkey")).alias("upi"),
        (50 + F.col("c_custkey") % 500).alias("length"),
        F.concat(F.lit("CRC"), F.col("c_custkey") % 1000).alias("crc64"),
    )


def synth_uniparc_matches(spark: SparkSession, sf: str):
    k = F.col("o_orderkey")
    sig = k % 50
    lib = F.element_at(F.array(*[F.lit(x) for x in _LIBS]), (sig % 9 + 1).cast("int"))
    s1 = 1 + k % 100
    s2 = 120 + k % 50
    loc = lambda s, e, score, frag, feat: F.struct(  # noqa: E731
        s.cast("long").alias("start"),
        e.cast("long").alias("end"),
        score.alias("score"),
        frag.alias("fragments"),
        feat.alias("seq_feature"),
    )
    return t(spark, sf, "orders").select(
        F.concat(F.lit("UPI"), F.col("o_custkey")).alias("upi"),
        F.concat(F.lit("SIG"), sig).alias("signature_acc"),
        F.concat(F.lit("Sig "), sig).alias("sig_name"),
        lib.alias("library"),
        F.lit("hmm").alias("evidence"),
        F.when(k % 4 != 0, F.concat(F.lit("MOD"), sig)).alias("model_acc"),
        F.when(sig % 3 == 0, F.concat(F.lit("IPR"), sig % 10)).alias("entry_acc"),
        F.when(sig % 3 == 0, F.concat(F.lit("Entry "), sig % 10)).alias("entry_name"),
        F.when(sig % 3 == 0, F.lit("Family")).alias("entry_type"),
        F.when((sig % 6 == 0), F.concat(F.lit("IPR"), (sig % 10 + 1) % 10)).alias(
            "entry_parent"
        ),
        F.array(
            loc(
                s1, s1 + 20, ((k % 8) / F.lit(4.0)),
                # k%5==1 rows carry an EMPTY fragments string — the
                # reference omits the attribute by truthiness
                # (ftp/uniparc.py:108-112), not just for NULL
                F.when(k % 5 == 0, F.concat(s1.cast("string"), F.lit("-"),
                                            (s1 + 20).cast("string"), F.lit("-S")))
                .when(k % 5 == 1, F.lit("")),
                # k%9==4 rows carry an EMPTY feature — same truthiness
                F.when(k % 9 == 4, F.lit(""))
                .when(k % 3 != 0, F.concat(F.lit("sf"), k % 3)),
            ),
            loc(
                s2, s2 + 9, (((k + 1) % 8) / F.lit(4.0)),
                F.lit(None).cast("string"),
                F.lit(None).cast("string"),
            ),
        ).alias("locations"),
    )


register(QuerySpec(
    name="z_xml_uniparc_proteins",
    tags=("S15", "X5", "F2", "O3"),
    description="uniparc_match <protein> element composition as pure JVM "
    "concat expressions (reference interpro/ftp/uniparc.py:60-125): "
    "attribute order (id,name,dbname,status,evd,model), PIRSR matches "
    "dropped, model fallback to the signature accession, optional ipr "
    "child with parent_id, per-location lcn with optional fragments and "
    "the HAMAP/PROSITE alignment-vs-sequence-feature naming; the oracle "
    "rebuilds the same bytes with SQL string concatenation.",
    build=lambda spark, sf: uniparc_protein_xml(
        synth_uniparc_matches(spark, sf), synth_uniparc_proteins(spark, sf)
    ),
    oracle="""
WITH m AS (
  SELECT 'UPI' || o_custkey AS upi,
         o_orderkey % 50 AS sig,
         o_orderkey AS k,
         ['Pfam','HAMAP','PIRSR','CDD','PROSITE profiles','SMART','NCBIfam','PANTHER','SSF']
           [CAST((o_orderkey % 50) % 9 AS INT) + 1] AS lib
  FROM orders
),
mx AS (
  SELECT upi,
         'SIG' || sig AS sort_key,
         '  <match id="SIG' || sig || '" name="Sig ' || sig || '" dbname="' || lib
           || '" status="T" evd="hmm" model="'
           || CASE WHEN k % 4 != 0 THEN 'MOD' || sig ELSE 'SIG' || sig END || '">' || chr(10)
           || CASE WHEN sig % 3 = 0 THEN
                '    <ipr id="IPR' || (sig % 10) || '" name="Entry ' || (sig % 10)
                  || '" type="Family"'
                  || CASE WHEN sig % 6 = 0
                          THEN ' parent_id="IPR' || ((sig % 10 + 1) % 10) || '"'
                          ELSE '' END
                  || '/>' || chr(10)
              ELSE '' END
           || '    <lcn start="' || (1 + k % 100) || '" end="' || (21 + k % 100)
           || '" score="' || CAST((k % 8) / 4.0 AS VARCHAR) || '"'
           || CASE WHEN k % 5 = 0
                   THEN ' fragments="' || (1 + k % 100) || '-' || (21 + k % 100) || '-S"'
                   ELSE '' END
           || CASE WHEN k % 3 != 0 AND k % 9 != 4
                   THEN ' ' || CASE WHEN lib IN ('HAMAP', 'PROSITE patterns', 'PROSITE profiles')
                                    THEN 'alignment' ELSE 'sequence-feature' END
                        || '="sf' || (k % 3) || '"'
                   ELSE '' END
           || '/>' || chr(10)
           || '    <lcn start="' || (120 + k % 50) || '" end="' || (129 + k % 50)
           || '" score="' || CAST(((k + 1) % 8) / 4.0 AS VARCHAR) || '"/>' || chr(10)
           || '  </match>' AS mxml
  FROM m WHERE lib != 'PIRSR'
),
agg AS (
  SELECT upi, string_agg(mxml, chr(10) ORDER BY sort_key, mxml) AS matches_xml
  FROM mx GROUP BY upi
),
prot AS (
  SELECT 'UPI' || c_custkey AS upi,
         50 + c_custkey % 500 AS length,
         'CRC' || (c_custkey % 1000) AS crc64
  FROM customer
)
SELECT p.upi,
       CASE WHEN a.matches_xml IS NULL
            THEN '<protein id="' || p.upi || '" length="' || p.length
                 || '" crc64="' || p.crc64 || '"/>'
            ELSE '<protein id="' || p.upi || '" length="' || p.length
                 || '" crc64="' || p.crc64 || '">' || chr(10) || a.matches_xml
                 || chr(10) || '</protein>'
       END AS xml
FROM prot p LEFT JOIN agg a USING (upi)
    """,
))
