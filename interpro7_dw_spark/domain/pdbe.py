"""PDBe / SIFTS structure pipeline (reference pdbe.py:26-96 +
interpro/oracle/structures.py:45-230 + interpro/xrefs/utils.py:22-54 +
interpro/mysql/structures.py:17-39,128-133):

- ``sifts_segments``: normalize the raw SIFTS UniProt->PDB chain
  segment rows — swap inverted protein coordinates, build the
  ``<pdb>_<chain>`` key, dedup (the reference query is DISTINCT);
- ``map_fragments_to_auth``: translate match fragment boundaries to
  author residue numbering through the per-chain SIFTS residue map —
  the reference's ``residues[start] / residues[end]`` dict lookups
  (oracle/structures.py:196-216) become two keyed joins; auth coords
  are set only when BOTH endpoints resolve to non-null entries;
- ``entry_structure_coverage``: the per-(signature, pdb) residue
  coverage + chain-length rollup feeding structure xrefs
  (xrefs/utils.py:22-54) — the 0/1 bitmap per chain becomes the
  O(#intervals) sorted fold from functions/intervals.py;
- ``structure_protein_segments``: the webfront_structure ``proteins``
  nesting — per (pdb, protein, chain), segments sorted by
  (protein_start, protein_end) (mysql/structures.py:128-133).

Scale shape: segments and residue maps are keyed by pdb_chain — the
joins shuffle on that key only; nothing is collected. The residue map
is one row per (chain, position) like the reference's per-chain SIFTS
dict, but partitioned instead of shelved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.intervals import interval_union_length


def sifts_segments(raw: DataFrame) -> DataFrame:
    """Normalize raw SIFTS segment rows (reference export_uniprot2pdb,
    pdbe.py:26-96): DISTINCT, inverted protein coordinates swapped
    (:69-70), ``pdb_chain`` key = ``<pdb_id>_<chain>`` (:61).

    ``raw`` columns: protein_acc, pdb_id, chain, protein_start,
    protein_end, structure_start, structure_end, auth_start, auth_end.
    """
    inv = F.col("protein_start") > F.col("protein_end")
    return raw.select(
        "protein_acc",
        "pdb_id",
        "chain",
        F.concat_ws("_", "pdb_id", "chain").alias("pdb_chain"),
        F.when(inv, F.col("protein_end")).otherwise(F.col("protein_start")).alias(
            "protein_start"
        ),
        F.when(inv, F.col("protein_start")).otherwise(F.col("protein_end")).alias(
            "protein_end"
        ),
        "structure_start",
        "structure_end",
        "auth_start",
        "auth_end",
    ).distinct()


def map_fragments_to_auth(frags: DataFrame, residue_map: DataFrame) -> DataFrame:
    """Attach author-numbering coordinates to match fragments
    (reference oracle/structures.py:196-216): look both fragment
    boundaries up in the chain's SIFTS residue map; keep the pair only
    when both positions exist AND both mapped values are non-null —
    otherwise both stay NULL.

    ``frags``: pdb_chain, signature_acc, frag_start, frag_end (one row
    per fragment). ``residue_map``: pdb_chain, seq_pos, auth_pos
    (auth_pos nullable). Two shuffle joins keyed (pdb_chain, pos).
    """
    rs = residue_map.select(
        "pdb_chain",
        F.col("seq_pos").alias("frag_start"),
        F.col("auth_pos").alias("auth_s"),
    )
    re_ = residue_map.select(
        "pdb_chain",
        F.col("seq_pos").alias("frag_end"),
        F.col("auth_pos").alias("auth_e"),
    )
    both = F.col("auth_s").isNotNull() & F.col("auth_e").isNotNull()
    return (
        frags.join(rs, ["pdb_chain", "frag_start"], "left")
        .join(re_, ["pdb_chain", "frag_end"], "left")
        .select(
            "pdb_chain",
            "signature_acc",
            "frag_start",
            "frag_end",
            F.when(both, F.col("auth_s")).alias("auth_start"),
            F.when(both, F.col("auth_e")).alias("auth_end"),
        )
    )


def entry_structure_coverage(
    frags: DataFrame, chain_lengths: DataFrame
) -> DataFrame:
    """Per-(signature, pdb) residue coverage (reference
    unpack_entry2structures, xrefs/utils.py:22-54): for every chain a
    signature matches, add the chain length to ``total_length`` and
    the number of residues covered by the union of the signature's
    fragments to ``covered``; roll both up to the pdb id.

    ``frags``: pdb_chain, signature_acc, frag_start, frag_end.
    ``chain_lengths``: pdb_chain, length.
    """
    per_chain = (
        frags.groupBy("pdb_chain", "signature_acc")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("frag_start").cast("long").alias("s"),
                    F.col("frag_end").cast("long").alias("e"),
                )
            ).alias("ivs")
        )
        .select(
            "pdb_chain",
            "signature_acc",
            interval_union_length(F.col("ivs")).alias("covered_chain"),
        )
        .join(chain_lengths, "pdb_chain")
    )
    return (
        per_chain.withColumn(
            "pdb_id", F.substring_index("pdb_chain", "_", 1)
        )
        .groupBy("signature_acc", "pdb_id")
        .agg(
            F.sum("length").alias("total_length"),
            F.sum("covered_chain").alias("covered"),
        )
    )


def structure_protein_segments(segments: DataFrame) -> DataFrame:
    """The webfront_structure ``proteins`` nesting at (pdb, protein,
    chain) grain (reference mysql/structures.py:128-133): segments
    sorted by (protein_start, protein_end), rendered canonically as
    ``ps-pe:ss-se:as-ae`` joined by commas.

    ``segments`` is :func:`sifts_segments` output.
    """
    return (
        segments.groupBy("pdb_id", "protein_acc", "chain")
        .agg(
            F.expr(
                """
                array_join(
                  transform(
                    array_sort(collect_list(struct(
                      protein_start, protein_end, structure_start,
                      structure_end, auth_start, auth_end))),
                    x -> concat(x.protein_start, '-', x.protein_end, ':',
                                x.structure_start, '-', x.structure_end, ':',
                                coalesce(cast(x.auth_start as string), 'null'), '-',
                                coalesce(cast(x.auth_end as string), 'null'))),
                  ',')
                """
            ).alias("segments_str"),
            F.count("*").alias("n_segments"),
        )
    )


def cath_scop_structure_json(
    cath: DataFrame, scop: DataFrame
) -> DataFrame:
    """The webfront_protein ``structure`` column (reference
    interpro/mysql/proteins.py:448-461 + pdbe.py:385-446): per protein
    a nested JSON {"cath": {dom_id: {"domain_id": <superfamily id>,
    "coordinates": [{start, end}...]}}, "scop": {...}} — families
    absent for the protein are omitted, proteins in neither family
    produce no row (jsonify empty->NULL upstream). Coordinates sorted
    by (start, end) like the reference's load-time sort
    (pdbe.py:443-444); dom keys sorted (reference dict order is
    cursor order — documented canonicalization).

    Inputs are long-format domain rows: protein_acc, dom_id,
    superfamily_id, start, end.
    """
    both = cath.withColumn("family", F.lit("cath")).unionByName(
        scop.withColumn("family", F.lit("scop"))
    )
    per_dom = both.groupBy("protein_acc", "family", "dom_id").agg(
        # the reference keeps the FIRST cursor row's superfamily per
        # dom (pdbe.py:427-436, cursor order) — min() is the
        # deterministic canonical pick
        F.min("superfamily_id").alias("superfamily_id"),
        F.concat(
            F.lit("["),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(start, end))),"
                " x -> concat('{\"start\":', x.start, ',\"end\":', x.end, '}')), ',')"
            ),
            F.lit("]"),
        ).alias("coords_json"),
    )
    per_family = per_dom.groupBy("protein_acc", "family").agg(
        F.concat(
            F.lit("{"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(dom_id,"
                " superfamily_id, coords_json))),"
                " x -> concat('\"', x.dom_id, '\":{\"domain_id\":\"',"
                " x.superfamily_id, '\",\"coordinates\":', x.coords_json, '}')), ',')"
            ),
            F.lit("}"),
        ).alias("family_json"),
    )
    return per_family.groupBy("protein_acc").agg(
        F.concat(
            F.lit("{"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(family,"
                " family_json))), x -> concat('\"', x.family, '\":',"
                " x.family_json)), ',')"
            ),
            F.lit("}"),
        ).alias("structure_json")
    )
