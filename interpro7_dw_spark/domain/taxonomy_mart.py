"""webfront_taxonomy mart family (reference interpro/mysql/taxa.py:
11-198, ``populate``): the three taxonomy tables composed from
long-format facts —

- ``webfront_taxonomy``: one row per protein-bearing taxon (the
  reference iterates the xrefs store, which holds exactly the taxa
  with >= 1 protein in their subtree): scientific/full name, the
  space-framed lineage string `` 1 131567 2 `` (F12, taxa.py:167),
  parent, rank, sorted children JSON, subtree protein count, and the
  counts JSON {entries: {total, <db>: n}, proteomes, proteins,
  structures};
- ``webfront_taxonomyperentry``: (taxon, entry) protein counts with
  {proteomes, proteins, structures} counts (taxa.py:135-147);
- ``webfront_taxonomyperentrydb``: (taxon, database) rollups
  (taxa.py:149-163).

Two structure sources merge exactly like the reference
(mysql/taxa.py:87-126): protein-side structures (any protein of the
subtree with a PDB cross-reference, xrefs/taxa.py:79-81) and
entry-side structure sets (structures whose own taxon is in the
subtree, carrying structure-level matches, xrefs/taxa.py:97-126) —
entry rows can therefore exist with zero proteins, and the per-taxon
``structures`` count is the union of both sides.

Spark-first shape: the reference's per-worker accumulate→spill→merge
(taxa.py:28-126) and lineage propagation (taxa.py:207-229) collapse
into ancestor-exploded groupBys over the transitive closure
(operators/graph.py) — one shuffle per rollup grain, partial
aggregation map-side, no custom dict merging. Canonical orders
(documented): children and db keys sorted; the reference's dict
insertion orders are load-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.graph import transitive_closure


def taxonomy_marts(
    taxa: DataFrame,
    protein_base: DataFrame,
    protein_matches: DataFrame,
    protein_structures: DataFrame,
    entry_pdb: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Compose the three taxonomy tables.

    Inputs:
    - ``taxa``: tax_id, parent_id (nullable), rank, sci_name,
      full_name;
    - ``protein_base``: protein_acc, tax_id (the protein's own taxon),
      proteome_id (nullable);
    - ``protein_matches``: protein_acc, db (lowercase), entry_acc;
    - ``protein_structures``: protein_acc, pdb_id;
    - ``entry_pdb``: tax_id (the STRUCTURE's taxon), db, entry_acc,
      pdb_id — the structure-side matches (xrefs/taxa.py:97-126).

    Returns (per_taxon, per_entry, per_db) DataFrames.
    """
    edges = taxa.filter(F.col("parent_id").isNotNull()).select(
        F.col("tax_id").alias("child"), F.col("parent_id").alias("parent")
    )
    closure = transitive_closure(edges)
    # lineage root->self, self included (reference oracle/taxa.py:38-53)
    lineage = (
        closure.groupBy("node")
        .agg(
            F.expr(
                "transform(reverse(array_sort(collect_list(struct(depth, anc)))),"
                " x -> x.anc)"
            ).alias("lineage")
        )
        .select(
            F.col("node").alias("tax_id"),
            F.concat(F.lit(" "), F.array_join("lineage", " "), F.lit(" ")).alias(
                "lineage_str"
            ),
        )
    )
    children = (
        edges.groupBy(F.col("parent").alias("tax_id"))
        .agg(
            F.concat(
                F.lit("["),
                F.expr(
                    "array_join(transform(array_sort(collect_list(child)),"
                    " c -> concat('\"', c, '\"')), ',')"
                ),
                F.lit("]"),
            ).alias("children_json")
        )
    )

    anc = closure.select(F.col("node").alias("tax_id"), "anc")

    # protein facts exploded onto every ancestor (incl. self)
    spine = protein_base.join(anc, "tax_id").select(
        F.col("anc").alias("tax_id"), "protein_acc", "proteome_id"
    )
    base_agg = spine.groupBy("tax_id").agg(
        F.count("*").alias("n_proteins"),
        F.countDistinct("proteome_id").alias("n_proteomes"),
    )
    struct_protein_side = (
        spine.join(protein_structures, "protein_acc")
        .select("tax_id", "pdb_id")
        .distinct()
    )

    # (taxon, db, entry) protein counts — one per (protein, entry)
    # (xrefs/taxa.py:53-72: entries counted per protein, db count once
    # per protein per database)
    tde = spine.join(protein_matches, "protein_acc").select(
        "tax_id", "db", "entry_acc", "protein_acc"
    )
    entry_prot = tde.groupBy("tax_id", "db", "entry_acc").agg(
        F.countDistinct("protein_acc").alias("e_proteins")
    )
    db_prot = tde.groupBy("tax_id", "db").agg(
        F.countDistinct("protein_acc").alias("db_proteins")
    )

    # structure-side entry sets, rolled up the lineage like everything
    # else (taxa.py:207-229 merges whole xref dicts along the lineage)
    if entry_pdb is not None:
        epdb = (
            entry_pdb.join(anc, "tax_id")
            .select(F.col("anc").alias("tax_id"), "db", "entry_acc", "pdb_id")
            .distinct()
        )
    else:
        epdb = spine.sparkSession.createDataFrame(
            [], "tax_id string, db string, entry_acc string, pdb_id string"
        )
    entry_struct = epdb.groupBy("tax_id", "db", "entry_acc").agg(
        F.countDistinct("pdb_id").alias("e_structures")
    )
    db_struct = epdb.groupBy("tax_id", "db").agg(
        F.countDistinct("pdb_id").alias("db_structures")
    )
    struct_entry_side = epdb.select("tax_id", "pdb_id").distinct()

    # ---- per-entry table: protein-side FULL OUTER structure-side ----
    per_entry_base = entry_prot.join(
        entry_struct, ["tax_id", "db", "entry_acc"], "full_outer"
    ).select(
        "tax_id",
        "db",
        "entry_acc",
        F.coalesce("e_proteins", F.lit(0)).alias("num_proteins"),
        F.coalesce("e_structures", F.lit(0)).alias("num_structures"),
    )
    per_entry = per_entry_base.join(
        base_agg.select("tax_id", "n_proteomes"), "tax_id", "left"
    ).select(
        "tax_id",
        "entry_acc",
        "num_proteins",
        F.concat(
            F.lit('{"proteomes":'), F.coalesce("n_proteomes", F.lit(0)),
            F.lit(',"proteins":'), F.col("num_proteins"),
            F.lit(',"structures":'), F.col("num_structures"),
            F.lit("}"),
        ).alias("counts"),
    )

    # ---- per-db table ----------------------------------------------
    db_entries = per_entry_base.groupBy("tax_id", "db").agg(
        F.count("*").alias("db_n_entries")
    )
    per_db_base = (
        db_entries.join(db_prot, ["tax_id", "db"], "left")
        .join(db_struct, ["tax_id", "db"], "left")
        .select(
            "tax_id",
            "db",
            F.coalesce("db_proteins", F.lit(0)).alias("num_proteins"),
            "db_n_entries",
            F.coalesce("db_structures", F.lit(0)).alias("db_structures"),
        )
    )
    per_db = per_db_base.join(
        base_agg.select("tax_id", "n_proteomes"), "tax_id", "left"
    ).select(
        "tax_id",
        F.col("db").alias("source_database"),
        "num_proteins",
        F.concat(
            F.lit('{"entries":'), F.col("db_n_entries"),
            F.lit(',"proteomes":'), F.coalesce("n_proteomes", F.lit(0)),
            F.lit(',"proteins":'), F.col("num_proteins"),
            F.lit(',"structures":'), F.col("db_structures"),
            F.lit("}"),
        ).alias("counts"),
    )

    # ---- per-taxon table -------------------------------------------
    entries_map = db_entries.groupBy("tax_id").agg(
        F.sum("db_n_entries").alias("total_entries"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(db, db_n_entries))),"
            " x -> concat('\"', x.db, '\":', x.db_n_entries)), ',')"
        ).alias("per_db_json"),
    )
    structs_all = (
        struct_protein_side.unionByName(struct_entry_side)
        .distinct()
        .groupBy("tax_id")
        .agg(F.count("*").alias("n_structures"))
    )
    per_taxon = (
        # inner join on base_agg: only protein-bearing subtrees get a
        # row, like the reference's xrefs-store iteration
        taxa.join(base_agg, "tax_id")
        .join(lineage, "tax_id", "left")
        .join(F.broadcast(children), "tax_id", "left")
        .join(entries_map, "tax_id", "left")
        .join(structs_all, "tax_id", "left")
        .select(
            "tax_id",
            "sci_name",
            "full_name",
            "lineage_str",
            "parent_id",
            "rank",
            "children_json",
            F.col("n_proteins").alias("num_proteins"),
            F.concat(
                F.lit('{"entries":{"total":'),
                F.coalesce("total_entries", F.lit(0)),
                F.when(
                    F.col("per_db_json").isNotNull() & (F.col("per_db_json") != ""),
                    F.concat(F.lit(","), F.col("per_db_json")),
                ).otherwise(F.lit("")),
                F.lit('},"proteomes":'), F.col("n_proteomes"),
                F.lit(',"proteins":'), F.col("n_proteins"),
                F.lit(',"structures":'), F.coalesce("n_structures", F.lit(0)),
                F.lit("}"),
            ).alias("counts"),
        )
    )
    return per_taxon, per_entry, per_db
