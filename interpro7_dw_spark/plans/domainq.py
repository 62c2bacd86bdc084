"""Domain-pipeline catalog entries: run the InterPro match-merge
pipeline (domain/pipeline.py — the reference's X1 task) over
match-shaped data synthesized deterministically from the star schema,
so its throughput shows up in bench and its plumbing in the
correctness run (rows-only: the pipeline's repr-selection search is
not SQL-expressible; its semantics are covered by golden + property
tests in tests/test_domain.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.pipeline import REPR_DOM_DATABASES, merge_protein_matches
from .spec import QuerySpec, register, t

_SIG_DBS = REPR_DOM_DATABASES + ["panther", "hamap"]
_SIG_TYPES = ["domain"] * len(REPR_DOM_DATABASES) + ["family", "region"]


def synth_matches(spark: SparkSession, sf: str):
    """lineitem -> match-shaped rows: order = protein, part = signature,
    positions derived from line number/quantity (deterministic)."""
    li = t(spark, sf, "lineitem")
    pos_from = (F.col("l_partkey") * 13 + F.col("l_linenumber") * 7) % 400 + 1
    return li.select(
        F.concat(F.lit("P"), F.col("l_orderkey")).alias("protein_acc"),
        F.concat(F.lit("SIG"), F.col("l_partkey") % 200).alias("signature_acc"),
        F.lit(None).cast("string").alias("model_acc"),
        pos_from.cast("long").alias("pos_from"),
        (pos_from + (F.col("l_quantity") * 3).cast("long") + 10).alias("pos_to"),
        F.lit(None).cast("string").alias("fragments"),
        F.col("l_discount").alias("score"),
    )


def synth_signatures(spark: SparkSession, sf: str):
    n_dbs = len(_SIG_DBS)
    idx = F.col("sig_id") % n_dbs
    db = F.lit(None).cast("string")
    typ = F.lit(None).cast("string")
    for i, (d, ty) in enumerate(zip(_SIG_DBS, _SIG_TYPES)):
        db = F.when(idx == i, d).otherwise(db)
        typ = F.when(idx == i, ty).otherwise(typ)
    return spark.range(200).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("signature_acc"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.concat(F.lit("sn"), F.col("id")).alias("short_name"),
        F.col("id").alias("sig_id"),
    ).select(
        "signature_acc",
        "name",
        "short_name",
        db.alias("database"),
        typ.alias("type"),
        F.lit("hmm").alias("evidence"),
        # every third signature integrated into an InterPro entry
        F.when(F.col("sig_id") % 3 == 0,
               F.concat(F.lit("IPR"), F.col("sig_id") % 40)).alias("entry_acc"),
    )


def synth_entries(spark: SparkSession, sf: str):
    return spark.range(40).select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        F.concat(F.lit("Entry "), F.col("id")).alias("name"),
        F.concat(F.lit("entry_"), F.col("id")).alias("short_name"),
        F.lit("Domain").alias("type"),
        F.lit(None).cast("string").alias("parent_acc"),
    )


register(QuerySpec(
    name="z_domain_merge_matches",
    tags=("X1", "G5", "W3", "F1", "J2"),
    description="Full InterPro match-merge pipeline (classify -> repr "
    "selection -> signature grouping -> entry condensation) on synthesized "
    "matches; rows-only (search not SQL-expressible; goldens in tests/).",
    build=lambda spark, sf: merge_protein_matches(
        synth_matches(spark, sf), synth_signatures(spark, sf), synth_entries(spark, sf)
    ),
    oracle=None,
))


def _flat_protein2ipr(spark: SparkSession, sf: str):
    from ..domain.flatfiles import protein2ipr_rows
    from ..domain.pipeline import classify_matches

    classified = classify_matches(synth_matches(spark, sf), synth_signatures(spark, sf))
    return protein2ipr_rows(classified, synth_entries(spark, sf))


register(QuerySpec(
    name="flat_protein2ipr",
    tags=("X1", "S16", "O1", "J2", "F1"),
    description="protein2ipr.dat rows (reference interpro/ftp/flatfiles.py:"
    "90-118): classify matches, keep integrated ones, emit one line per "
    "location with the entry name broadcast-joined and span = (first "
    "fragment start, max fragment end). SURVEY Phase-1 acceptance.",
    build=_flat_protein2ipr,
    oracle="""
        SELECT 'P' || l_orderkey AS protein_acc,
               'IPR' || ((l_partkey % 200) % 40) AS entry_acc,
               'Entry ' || ((l_partkey % 200) % 40) AS entry_name,
               'SIG' || (l_partkey % 200) AS signature_acc,
               ((l_partkey * 13 + l_linenumber * 7) % 400 + 1) AS pos_start,
               ((l_partkey * 13 + l_linenumber * 7) % 400 + 1)
                 + CAST(l_quantity * 3 AS BIGINT) + 10 AS pos_end
        FROM lineitem
        WHERE (l_partkey % 200) % 3 = 0
    """,
))


_LOOKUP_LIBS = [
    "AntiFam", "CATH-Gene3D", "CDD", "COILS", "FunFam", "HAMAP",
    "MobiDB Lite", "NCBIFAM", "PANTHER", "Pfam", "Phobius", "PIRSF",
    "PIRSR", "PRINTS", "PROSITE patterns", "PROSITE profiles", "SFLD",
    "SMART", "SUPERFAMILY", "SignalP_Euk", "SignalP_Gram_positive",
    "SignalP_Gram_negative", "TMHMM",
]

_SITES_T = (
    "array<struct<description string, numLocations int, siteLocations "
    "array<struct<res_start bigint, res_end bigint, residue string>>>>"
)


def synth_lookup_matches(spark: SparkSession, sf: str):
    """orders -> merge_uniparc_matches-shaped rows covering all 23
    analysis libraries (including the four the formatter must drop)."""
    start = (F.col("o_orderkey") % 300 + 1).cast("long")
    end = start + 50
    lib = F.element_at(
        F.array(*[F.lit(x) for x in _LOOKUP_LIBS]),
        (F.col("o_orderkey") % len(_LOOKUP_LIBS) + 1).cast("int"),
    )
    loc = F.struct(
        start.alias("start"),
        end.alias("end"),
        F.lit(1).cast("long").alias("hmmStart"),
        F.lit(50).cast("long").alias("hmmEnd"),
        F.lit(50).cast("long").alias("hmmLength"),
        F.lit("COMPLETE").alias("hmmBounds"),
        start.alias("envelopeStart"),
        end.alias("envelopeEnd"),
        F.lit(1e-5).alias("evalue"),
        F.col("o_totalprice").alias("score"),
        F.array(
            F.struct(
                start.alias("start"), end.alias("end"),
                F.lit("CONTINUOUS").alias("dc_status"),
            )
        ).alias("location_fragments"),
        F.concat_ws("", F.lit("SF"), F.col("o_orderkey") % 7).alias("sequence_feature"),
        F.expr(f"CAST(array() AS {_SITES_T})").alias("sites"),
    )
    sig = F.concat_ws("", F.lit("SIG"), F.col("o_orderkey") % 50)
    return t(spark, sf, "orders").select(
        F.concat_ws("", F.lit("UPI"), F.col("o_custkey")).alias("upi"),
        sig.alias("signature_acc"),
        sig.alias("model_acc"),
        lib.alias("library"),
        F.lit("v1").alias("version"),
        F.col("o_totalprice").alias("score"),
        F.lit(1e-5).alias("evalue"),
        F.array(loc).alias("locations"),
    )


def _lookup_match_json(spark: SparkSession, sf: str):
    from ..domain.lookup_format import format_lookup_matches

    formatted = format_lookup_matches(synth_lookup_matches(spark, sf))
    return (
        formatted.select(
            "library",
            F.array_join(
                F.array_sort(F.json_object_keys("match_json")), ","
            ).alias("match_keys"),
            F.array_join(
                F.array_sort(
                    F.json_object_keys(F.get_json_object("match_json", "$.locations[0]"))
                ),
                ",",
            ).alias("loc_keys"),
        )
        .groupBy("library", "match_keys", "loc_keys")
        .agg(F.count(F.lit(1)).alias("n"))
    )


register(QuerySpec(
    name="lookup_match_json",
    tags=("X4", "F8", "F9"),
    description="X4 per-library lookup formatting (reference interpro/"
    "lookup.py:151-418): the 17-way when-chain dispatch, library "
    "canonicalization (FunFam->CATH-FunFam, MobiDB Lite->MobiDB-lite), "
    "SignalP*/TMHMM drops, and per-library JSON shapes — verified by "
    "extracting the exact key set each branch emits at match and location "
    "level (byte-level JSON goldens in tests/test_lookup_format.py).",
    build=_lookup_match_json,
    oracle="""
        WITH raw AS (
          SELECT (['AntiFam','CATH-Gene3D','CDD','COILS','FunFam','HAMAP',
                   'MobiDB Lite','NCBIFAM','PANTHER','Pfam','Phobius','PIRSF',
                   'PIRSR','PRINTS','PROSITE patterns','PROSITE profiles','SFLD',
                   'SMART','SUPERFAMILY','SignalP_Euk','SignalP_Gram_positive',
                   'SignalP_Gram_negative','TMHMM'])[(o_orderkey % 23) + 1] AS lib
          FROM orders
        ), canon AS (
          SELECT CASE lib WHEN 'FunFam' THEN 'CATH-FunFam'
                          WHEN 'MobiDB Lite' THEN 'MobiDB-lite'
                          ELSE lib END AS library
          FROM raw
          WHERE lib NOT IN ('SignalP_Euk', 'SignalP_Gram_positive',
                            'SignalP_Gram_negative', 'TMHMM')
        )
        SELECT library,
               CASE
                 WHEN library IN ('AntiFam','CATH-FunFam','CATH-Gene3D','NCBIFAM',
                                  'Pfam','PIRSF','PIRSR','SFLD','SMART')
                   THEN 'evalue,locations,model-ac,score,signature'
                 WHEN library = 'PANTHER'
                   THEN 'ancestralNode,evalue,locations,model-ac,score,signature'
                 WHEN library = 'PRINTS'
                   THEN 'evalue,graphscan,locations,model-ac,signature'
                 ELSE 'locations,model-ac,signature'
               END AS match_keys,
               CASE
                 WHEN library IN ('AntiFam','CATH-FunFam','CATH-Gene3D','NCBIFAM',
                                  'Pfam','PIRSF')
                   THEN 'end,envelopeEnd,envelopeStart,evalue,hmmBounds,hmmEnd,hmmLength,hmmStart,location-fragments,score,start'
                 WHEN library IN ('PIRSR','SFLD')
                   THEN 'end,envelopeEnd,envelopeStart,evalue,hmmEnd,hmmLength,hmmStart,location-fragments,score,sites,start'
                 WHEN library = 'SMART'
                   THEN 'end,evalue,hmmBounds,hmmEnd,hmmLength,hmmStart,location-fragments,score,start'
                 WHEN library = 'CDD'
                   THEN 'end,evalue,location-fragments,score,sites,start'
                 WHEN library IN ('COILS','Phobius')
                   THEN 'end,location-fragments,start'
                 WHEN library = 'MobiDB-lite'
                   THEN 'end,location-fragments,sequence-feature,start'
                 WHEN library = 'PANTHER'
                   THEN 'end,envelopeEnd,envelopeStart,hmmBounds,hmmEnd,hmmLength,hmmStart,location-fragments,start'
                 WHEN library = 'PRINTS'
                   THEN 'end,location-fragments,motifNumber,pvalue,score,start'
                 WHEN library IN ('HAMAP','PROSITE profiles')
                   THEN 'cigarAlignment,end,location-fragments,score,start'
                 WHEN library = 'PROSITE patterns'
                   THEN 'cigarAlignment,end,location-fragments,start'
                 WHEN library = 'SUPERFAMILY'
                   THEN 'end,evalue,hmmLength,location-fragments,start'
               END AS loc_keys,
               count(*) AS n
        FROM canon
        GROUP BY 1, 2, 3
    """,
))


def _search_documents(spark: SparkSession, sf: str):
    from ..domain.documents import relationship_documents

    orders = t(spark, sf, "orders")
    proteins = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("protein_acc"),
        F.col("c_nationkey").cast("string").alias("tax_id"),
    )
    protein_entries = orders.select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.col("o_orderpriority").alias("entry_acc"),
    ).distinct()
    # "chains" = order years before 1997; later-only customers fall
    # back to chain-less docs, and 1997+ years become structure leftovers
    protein_chains = orders.filter(F.col("o_orderdate") < "1997-01-01").select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.year("o_orderdate").cast("string").alias("pdb_chain"),
    ).distinct()
    entries = orders.select(F.col("o_orderpriority").alias("entry_acc")).distinct()
    structures = orders.select(F.year("o_orderdate").cast("string").alias("pdb_chain")).distinct()
    taxa = t(spark, sf, "nation").select(F.col("n_nationkey").cast("string").alias("tax_id"))
    return relationship_documents(
        proteins, protein_entries, protein_chains, entries, structures, taxa
    )


register(QuerySpec(
    name="search_documents",
    tags=("J9", "J5", "U1"),
    description="Search-document fan-out: (protein x entry x chain) cross "
    "product with fallback docs + anti-join leftovers (reference ES export, "
    "interpro/elastic/export.py:576-701,129-284).",
    build=_search_documents,
    oracle="""
        WITH pe AS (
          SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS protein_acc,
                 o_orderpriority AS entry_acc FROM orders
        ), pc AS (
          SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS protein_acc,
                 CAST(year(o_orderdate) AS VARCHAR) AS pdb_chain
          FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        ), fan AS (
          SELECT CAST(c.c_custkey AS VARCHAR) AS protein_acc,
                 pe.entry_acc, pc.pdb_chain,
                 CAST(c.c_nationkey AS VARCHAR) AS tax_id,
                 'relationship' AS doc_type
          FROM customer c
          LEFT JOIN pe ON pe.protein_acc = CAST(c.c_custkey AS VARCHAR)
          LEFT JOIN pc ON pc.protein_acc = CAST(c.c_custkey AS VARCHAR)
        ), lo_entry AS (
          SELECT NULL AS protein_acc, e.entry_acc, NULL AS pdb_chain,
                 NULL AS tax_id, 'entry' AS doc_type
          FROM (SELECT DISTINCT o_orderpriority AS entry_acc FROM orders) e
          WHERE e.entry_acc NOT IN (SELECT DISTINCT entry_acc FROM fan WHERE entry_acc IS NOT NULL)
        ), lo_struct AS (
          SELECT NULL, NULL, s.pdb_chain, NULL, 'structure'
          FROM (SELECT DISTINCT CAST(year(o_orderdate) AS VARCHAR) AS pdb_chain FROM orders) s
          WHERE s.pdb_chain NOT IN (SELECT DISTINCT pdb_chain FROM fan WHERE pdb_chain IS NOT NULL)
        ), lo_tax AS (
          SELECT NULL, NULL, NULL, CAST(n_nationkey AS VARCHAR), 'taxon'
          FROM nation
          WHERE CAST(n_nationkey AS VARCHAR) NOT IN (SELECT DISTINCT tax_id FROM fan WHERE tax_id IS NOT NULL)
        ), docs AS (
          SELECT * FROM fan
          UNION ALL SELECT * FROM lo_entry
          UNION ALL SELECT * FROM lo_struct
          UNION ALL SELECT * FROM lo_tax
        )
        SELECT concat_ws('-', coalesce(protein_acc, ''), coalesce(entry_acc, ''),
                         coalesce(pdb_chain, ''), coalesce(tax_id, '')) AS doc_id,
               protein_acc, entry_acc, pdb_chain, tax_id, doc_type
        FROM docs
    """,
))
