"""PDBe / SIFTS catalog entries (domain/pdbe.py — reference
pdbe.py:26-96, oracle/structures.py:45-230, xrefs/utils.py:22-54,
mysql/structures.py:128-133) over star-synthesized structures:

  segments    = orders: protein o_custkey -> PDB(o_orderkey%30) chain
                A-D, protein coords from modular arithmetic with every
                5th row inverted in the raw input (exercising the
                swap), structure coords +7, author coords +100 with a
                protein-start-determined null stripe
  chain maps  = (chain, seq_pos 1..150, auth_pos) with chain D maps
                truncated at 60 (missing-key path) and a (pos+p)%13
                null stripe (null-value path)
  chain match = lineitem fragments: SIG(l_partkey%50) on
                PDB(l_partkey%30)_chain(l_suppkey%4)
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.pdbe import (
    entry_structure_coverage,
    map_fragments_to_auth,
    sifts_segments,
    structure_protein_segments,
)
from .spec import QuerySpec, register, t

_CHAINS = ["A", "B", "C", "D"]


def synth_raw_segments(spark: SparkSession, sf: str):
    k = F.col("o_orderkey")
    ps0 = 1 + k % 97
    pe0 = ps0 + 20 + k % 31
    inv = k % 5 == 0
    return t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("protein_acc"),
        F.concat(F.lit("PDB"), k % 30).alias("pdb_id"),
        F.element_at(
            F.array(*[F.lit(c) for c in _CHAINS]), (k % 4 + 1).cast("int")
        ).alias("chain"),
        F.when(inv, pe0).otherwise(ps0).cast("long").alias("protein_start"),
        F.when(inv, ps0).otherwise(pe0).cast("long").alias("protein_end"),
        (ps0 + 7).cast("long").alias("structure_start"),
        (pe0 + 7).cast("long").alias("structure_end"),
        F.when((k % 97) % 11 != 3, ps0 + 107).cast("long").alias("auth_start"),
        F.when((k % 97) % 11 != 3, pe0 + 107).cast("long").alias("auth_end"),
    )


def synth_chain_frags(spark: SparkSession, sf: str):
    li = t(spark, sf, "lineitem")
    start = 1 + (F.col("l_linenumber") * 9 + F.col("l_partkey") % 5)
    return li.select(
        F.concat(
            F.lit("PDB"),
            F.col("l_partkey") % 30,
            F.lit("_"),
            F.element_at(
                F.array(*[F.lit(c) for c in _CHAINS]),
                (F.col("l_suppkey") % 4 + 1).cast("int"),
            ),
        ).alias("pdb_chain"),
        F.concat(F.lit("SIG"), F.col("l_partkey") % 50).alias("signature_acc"),
        start.cast("long").alias("frag_start"),
        (start + 10 + F.col("l_orderkey") % 23).cast("long").alias("frag_end"),
    )


def synth_residue_map(spark: SparkSession):
    # (chain, seq_pos, auth_pos): 30 pdbs x 4 chains x 150 positions;
    # chain D truncated at 60, auth null when (pos + p) % 13 = 0
    df = spark.range(30 * 4 * 150).select(
        (F.col("id") / 600).cast("long").alias("p"),
        ((F.col("id") % 600) / 150).cast("long").alias("c"),
        (F.col("id") % 150 + 1).alias("seq_pos"),
    )
    return df.filter((F.col("c") != 3) | (F.col("seq_pos") <= 60)).select(
        F.concat(
            F.lit("PDB"), F.col("p"), F.lit("_"),
            F.element_at(F.array(*[F.lit(c) for c in _CHAINS]), (F.col("c") + 1).cast("int")),
        ).alias("pdb_chain"),
        "seq_pos",
        F.when(
            (F.col("seq_pos") + F.col("p")) % 13 != 0,
            F.col("seq_pos") + (F.col("p") % 7) * 10,
        ).alias("auth_pos"),
    )


def synth_chain_lengths(spark: SparkSession):
    df = spark.range(120).select(
        (F.col("id") / 4).cast("long").alias("p"), (F.col("id") % 4).alias("c")
    )
    return df.select(
        F.concat(
            F.lit("PDB"), F.col("p"), F.lit("_"),
            F.element_at(F.array(*[F.lit(c) for c in _CHAINS]), (F.col("c") + 1).cast("int")),
        ).alias("pdb_chain"),
        (200 + F.col("p") * 3 + F.col("c")).alias("length"),
    )


_CHAIN_SQL = "['A','B','C','D'][CAST({i} AS INT) + 1]"

_FRAGS_CTE = f"""
  frags AS (
    SELECT 'PDB' || (l_partkey % 30) || '_' || {_CHAIN_SQL.format(i="l_suppkey % 4")} AS pdb_chain,
           'SIG' || (l_partkey % 50) AS signature_acc,
           CAST(1 + (l_linenumber * 9 + l_partkey % 5) AS BIGINT) AS frag_start,
           CAST(1 + (l_linenumber * 9 + l_partkey % 5) + 10 + l_orderkey % 23 AS BIGINT) AS frag_end
    FROM lineitem
  )
"""


register(QuerySpec(
    name="z_pdbematches",
    tags=("J1", "J10", "P4", "F9"),
    description="PDB chain match fragments mapped to author residue "
    "numbering through the per-chain SIFTS residue map (reference "
    "interpro/oracle/structures.py:196-216): both endpoints looked up, "
    "auth coords kept only when both resolve non-null — dict lookups "
    "re-expressed as two keyed joins; exercises missing-key (truncated "
    "chain D maps) and null-value (13-stripe) paths.",
    build=lambda spark, sf: map_fragments_to_auth(
        synth_chain_frags(spark, sf), synth_residue_map(spark)
    ),
    oracle=f"""
WITH {_FRAGS_CTE},
rmap AS (
  SELECT 'PDB' || p || '_' || {_CHAIN_SQL.format(i="c")} AS pdb_chain,
         pos AS seq_pos,
         CASE WHEN (pos + p) % 13 != 0 THEN pos + (p % 7) * 10 END AS auth_pos
  FROM (SELECT unnest(generate_series(0, 29)) AS p),
       (SELECT unnest(generate_series(0, 3)) AS c),
       (SELECT unnest(generate_series(1, 150)) AS pos)
  WHERE c != 3 OR pos <= 60
)
SELECT f.pdb_chain, f.signature_acc, f.frag_start, f.frag_end,
       CASE WHEN rs.auth_pos IS NOT NULL AND re.auth_pos IS NOT NULL
            THEN rs.auth_pos END AS auth_start,
       CASE WHEN rs.auth_pos IS NOT NULL AND re.auth_pos IS NOT NULL
            THEN re.auth_pos END AS auth_end
FROM frags f
LEFT JOIN rmap rs ON f.pdb_chain = rs.pdb_chain AND f.frag_start = rs.seq_pos
LEFT JOIN rmap re ON f.pdb_chain = re.pdb_chain AND f.frag_end = re.seq_pos
    """,
))


register(QuerySpec(
    name="z_pdbe_entry2structures",
    tags=("A14", "F10", "A1"),
    description="Per-(signature, pdb) residue coverage rollup feeding "
    "structure xrefs (reference unpack_entry2structures, "
    "interpro/xrefs/utils.py:22-54): chain lengths summed per matched "
    "chain, fragment interval-union coverage per (signature, chain), "
    "both rolled up to the pdb id — the 0/1 bitmap as an O(#intervals) "
    "fold, proven against count(DISTINCT pos).",
    build=lambda spark, sf: entry_structure_coverage(
        synth_chain_frags(spark, sf), synth_chain_lengths(spark)
    ),
    oracle=f"""
WITH {_FRAGS_CTE},
per_chain AS (
  SELECT pdb_chain, signature_acc, count(DISTINCT pos) AS covered_chain
  FROM frags, LATERAL unnest(generate_series(frag_start, frag_end)) AS t(pos)
  GROUP BY 1, 2
),
lens AS (
  SELECT 'PDB' || p || '_' || {_CHAIN_SQL.format(i="c")} AS pdb_chain,
         200 + p * 3 + c AS length
  FROM (SELECT unnest(generate_series(0, 29)) AS p),
       (SELECT unnest(generate_series(0, 3)) AS c)
)
SELECT signature_acc, string_split(pdb_chain, '_')[1] AS pdb_id,
       CAST(sum(length) AS BIGINT) AS total_length,
       CAST(sum(covered_chain) AS BIGINT) AS covered
FROM per_chain JOIN lens USING (pdb_chain)
GROUP BY 1, 2
    """,
))


register(QuerySpec(
    name="z_pdbe_segments",
    tags=("S1", "O3", "F2", "A4"),
    description="UniProt->PDB chain segment normalization + the "
    "webfront_structure proteins nesting (reference pdbe.py:26-96 and "
    "interpro/mysql/structures.py:128-133): DISTINCT raw rows, inverted "
    "protein coordinates swapped, per-(pdb, protein, chain) segments "
    "sorted by (protein_start, protein_end) and rendered canonically.",
    build=lambda spark, sf: structure_protein_segments(
        sifts_segments(synth_raw_segments(spark, sf))
    ),
    oracle="""
WITH raw AS (
  SELECT CAST(o_custkey AS VARCHAR) AS protein_acc,
         'PDB' || (o_orderkey % 30) AS pdb_id,
         ['A','B','C','D'][CAST(o_orderkey % 4 AS INT) + 1] AS chain,
         1 + o_orderkey % 97 AS ps, 1 + o_orderkey % 97 + 20 + o_orderkey % 31 AS pe,
         o_orderkey % 5 = 0 AS inv,
         (o_orderkey % 97) % 11 != 3 AS has_auth
  FROM orders
),
norm AS (
  -- the raw input inverts protein coords on every 5th row; the
  -- normalization swaps them back, so (ps, pe) is always the result
  SELECT DISTINCT protein_acc, pdb_id, chain,
         CAST(ps AS BIGINT) AS protein_start, CAST(pe AS BIGINT) AS protein_end,
         CAST(ps + 7 AS BIGINT) AS structure_start, CAST(pe + 7 AS BIGINT) AS structure_end,
         CASE WHEN has_auth THEN CAST(ps + 107 AS BIGINT) END AS auth_start,
         CASE WHEN has_auth THEN CAST(pe + 107 AS BIGINT) END AS auth_end
  FROM raw
)
SELECT pdb_id, protein_acc, chain,
       string_agg(protein_start || '-' || protein_end || ':'
                  || structure_start || '-' || structure_end || ':'
                  || coalesce(CAST(auth_start AS VARCHAR), 'null') || '-'
                  || coalesce(CAST(auth_end AS VARCHAR), 'null'),
                  ',' ORDER BY protein_start, protein_end, structure_start, structure_end)
         AS segments_str,
       count(*) AS n_segments
FROM norm
GROUP BY 1, 2, 3
    """,
))


def _synth_cath_scop(spark: SparkSession, sf: str):
    from ..domain.pdbe import cath_scop_structure_json

    li = t(spark, sf, "lineitem")
    k = F.col("l_orderkey")
    base = li.select(
        (k % 900).cast("string").alias("protein_acc"),
        k,
        F.col("l_partkey"),
        (F.col("l_linenumber") * 11 + k % 13 + 1).cast("int").alias("start"),
        (F.col("l_linenumber") * 11 + k % 13 + 1 + F.col("l_partkey") % 60)
        .cast("int")
        .alias("end"),
    )
    cath = base.filter(k % 3 == 0).select(
        "protein_acc",
        F.concat(F.lit("C"), F.col("l_partkey") % 12).alias("dom_id"),
        F.concat(F.lit("1.10."), F.col("l_partkey") % 5).alias("superfamily_id"),
        "start",
        "end",
    )
    scop = base.filter(k % 3 == 1).select(
        "protein_acc",
        F.concat(F.lit("S"), F.col("l_partkey") % 12).alias("dom_id"),
        F.concat(F.lit("b.1."), F.col("l_partkey") % 5).alias("superfamily_id"),
        "start",
        "end",
    )
    return cath_scop_structure_json(cath, scop)


register(QuerySpec(
    name="z_protein_cathscop",
    tags=("A8", "F8", "U1"),
    description="webfront_protein structure column (reference "
    "interpro/mysql/proteins.py:448-461 + pdbe.py:385-446): per-protein "
    "{cath: {dom: {domain_id, coordinates}}, scop: {...}} nested JSON "
    "with (start, end)-sorted coordinates, families omitted when "
    "absent; a three-level bottom-up JSON fold.",
    build=lambda spark, sf: _synth_cath_scop(spark, sf),
    oracle="""
WITH base AS (
  SELECT CAST(l_orderkey % 900 AS VARCHAR) AS protein_acc,
         l_orderkey AS k, l_partkey,
         CAST(l_linenumber * 11 + l_orderkey % 13 + 1 AS INT) AS s,
         CAST(l_linenumber * 11 + l_orderkey % 13 + 1 + l_partkey % 60 AS INT) AS e
  FROM lineitem
),
doms AS (
  SELECT protein_acc, 'cath' AS family, 'C' || (l_partkey % 12) AS dom_id,
         '1.10.' || (l_partkey % 5) AS superfamily_id, s, e
  FROM base WHERE k % 3 = 0
  UNION ALL
  SELECT protein_acc, 'scop', 'S' || (l_partkey % 12),
         'b.1.' || (l_partkey % 5), s, e
  FROM base WHERE k % 3 = 1
),
per_dom AS (
  SELECT protein_acc, family, dom_id,
         min(superfamily_id) AS superfamily_id,
         '[' || string_agg('{"start":' || s || ',"end":' || e || '}',
                           ',' ORDER BY s, e) || ']' AS coords_json
  FROM doms GROUP BY 1, 2, 3
),
per_family AS (
  SELECT protein_acc, family,
         '{' || string_agg(
           '"' || dom_id || '":{"domain_id":"' || superfamily_id
             || '","coordinates":' || coords_json || '}',
           ',' ORDER BY dom_id) || '}' AS family_json
  FROM per_dom GROUP BY 1, 2
)
SELECT protein_acc,
       '{' || string_agg('"' || family || '":' || family_json,
                         ',' ORDER BY family) || '}' AS structure_json
FROM per_family GROUP BY 1
    """,
))
