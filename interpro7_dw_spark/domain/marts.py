"""Webfront-style mart composition (SURVEY.md Phase 4-5; reference
export-entry2xrefs interpro/xrefs/entries.py:258-505 — its biggest
aggregation, budgeted 16 cpu / 100 GB — and the webfront_* count
columns interpro/mysql/*).

The reference accumulates per-entry dicts across workers and merges
them recursively (copy_dict). Spark-first: every xref family is a
long-format groupBy from the protein-keyed join spine; the mart row
re-nests deterministic counts at write time with the jsonify
empty->NULL rule. One shuffle per family + one final join per mart —
no custom merge code, partial aggregation everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.json_out import jsonify


def entry_xrefs_mart(
    protein_entries: DataFrame,    # protein_acc, entry_acc
    protein_taxa: DataFrame,       # protein_acc, tax_id
    protein_proteomes: DataFrame,  # protein_acc, proteome_id (nullable rows absent)
    protein_structures: DataFrame, # protein_acc, pdb_id
) -> DataFrame:
    """One row per entry with exact counts and a canonical JSON map of
    per-taxon protein counts (the reference's entry["taxa"] dict,
    interpro/xrefs/entries.py:204-207)."""
    base = protein_entries.select("protein_acc", "entry_acc")

    proteins = base.groupBy("entry_acc").agg(
        F.countDistinct("protein_acc").alias("n_proteins")
    )
    taxa_counts = (
        base.join(protein_taxa, "protein_acc")
        .groupBy("entry_acc", "tax_id")
        .agg(F.countDistinct("protein_acc").alias("n"))
    )
    taxa_nested = taxa_counts.groupBy("entry_acc").agg(
        F.countDistinct("tax_id").alias("n_taxa"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("tax_id", "n")))
        ).alias("taxa_map"),
    )
    proteomes = (
        base.join(protein_proteomes, "protein_acc")
        .groupBy("entry_acc")
        .agg(F.countDistinct("proteome_id").alias("n_proteomes"))
    )
    structures = (
        base.join(protein_structures, "protein_acc")
        .groupBy("entry_acc")
        .agg(F.countDistinct("pdb_id").alias("n_structures"))
    )
    return (
        proteins.join(taxa_nested, "entry_acc", "left")
        .join(proteomes, "entry_acc", "left")
        .join(structures, "entry_acc", "left")
        .select(
            "entry_acc",
            "n_proteins",
            F.coalesce("n_taxa", F.lit(0)).alias("n_taxa"),
            F.coalesce("n_proteomes", F.lit(0)).alias("n_proteomes"),
            F.coalesce("n_structures", F.lit(0)).alias("n_structures"),
            jsonify(F.col("taxa_map")).alias("taxa_json"),
        )
    )
