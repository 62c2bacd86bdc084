"""webfront_proteome mart family (reference interpro/mysql/
proteomes.py:11-188, ``populate``): the three proteome tables composed
from long-format facts —

- ``webfront_proteome``: one row per proteome with ≥1 protein (the
  reference iterates the proteome2xrefs store, fed by the
  protein→proteome KVStore): name, is_reference, strain, assembly,
  taxonomy_id, protein count, and the counts JSON
  {entries: {total, <db>: n}, proteins, structures}
  (mysql/proteomes.py:160-173);
- ``webfront_proteomeperentry``: (proteome, entry) protein counts with
  {proteins, structures} counts — NO proteomes key, unlike the
  taxonomy sibling (mysql/proteomes.py:131-139);
- ``webfront_proteomeperentrydb``: (proteome, database) rollups with
  {entries, proteins, structures} (mysql/proteomes.py:145-154).

Two structure sources merge exactly like the reference:
- protein-side: any protein of the proteome with a PDB cross-reference
  counts toward the proteome total only (uniprot2pdb,
  xrefs/proteomes.py:75-78 — kept regardless of entry matches);
- entry-side: structures whose taxon IS the proteome's taxon, carrying
  structure-level matches (xrefs/proteomes.py:93-116 via
  ``proteome2taxon``) — these populate per-entry / per-db structure
  sets and also join the proteome-total union
  (mysql/proteomes.py:99-122).

Entry protein counts use one count per (protein, signature) — after
the X1 merge each protein holds at most one match row per signature,
so the reference's ``db["entries"][match_acc] += 1``
(xrefs/proteomes.py:66-70) is a distinct-protein count; the per-db
protein count is explicitly once-per-protein-per-db
(xrefs/proteomes.py:57-64).

Spark-first shape: the per-worker accumulate→spill→merge collapses
into groupBys over the proteome key — partial aggregation map-side,
one shuffle per rollup grain, broadcast proteome dim. No lineage
rollup exists here (unlike taxonomy): xrefs attach to the proteome
directly. Canonical order (documented): db keys in the per-proteome
entries JSON are sorted; the reference's dict insertion order is
load-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def proteome_marts(
    proteomes: DataFrame,
    protein_base: DataFrame,
    protein_matches: DataFrame,
    protein_structures: DataFrame,
    entry_pdb: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Compose the three proteome tables.

    Inputs:
    - ``proteomes``: proteome_id, name, is_reference (bool), strain,
      assembly, taxon_id;
    - ``protein_base``: protein_acc, proteome_id (nullable — proteins
      outside any proteome are skipped, like the proteome2xrefs store);
    - ``protein_matches``: protein_acc, db (lowercase), entry_acc;
    - ``protein_structures``: protein_acc, pdb_id (uniprot2pdb);
    - ``entry_pdb``: taxon_id (the STRUCTURE's taxon), db, entry_acc,
      pdb_id — structure-level matches, attached to proteomes through
      the proteome's own taxon (xrefs/proteomes.py:93-116).

    Returns (per_proteome, per_entry, per_db) DataFrames.
    """
    spine = protein_base.filter(F.col("proteome_id").isNotNull()).select(
        "proteome_id", "protein_acc"
    )
    base_agg = spine.groupBy("proteome_id").agg(F.count("*").alias("n_proteins"))

    # (proteome, db, entry) and (proteome, db) protein counts
    tde = spine.join(protein_matches, "protein_acc").select(
        "proteome_id", "db", "entry_acc", "protein_acc"
    )
    entry_prot = tde.groupBy("proteome_id", "db", "entry_acc").agg(
        F.countDistinct("protein_acc").alias("e_proteins")
    )
    db_prot = tde.groupBy("proteome_id", "db").agg(
        F.countDistinct("protein_acc").alias("db_proteins")
    )

    # entry-side structure sets via the proteome's taxon
    pdim = proteomes.select("proteome_id", "taxon_id")
    if entry_pdb is not None:
        epdb = (
            F.broadcast(pdim)
            .join(entry_pdb, "taxon_id")
            .select("proteome_id", "db", "entry_acc", "pdb_id")
            .distinct()
        )
    else:
        epdb = spine.sparkSession.createDataFrame(
            [], "proteome_id string, db string, entry_acc string, pdb_id string"
        )
    entry_struct = epdb.groupBy("proteome_id", "db", "entry_acc").agg(
        F.countDistinct("pdb_id").alias("e_structures")
    )
    db_struct = epdb.groupBy("proteome_id", "db").agg(
        F.countDistinct("pdb_id").alias("db_structures")
    )

    # ---- per-entry table: protein-side FULL OUTER structure-side ----
    per_entry_base = entry_prot.join(
        entry_struct, ["proteome_id", "db", "entry_acc"], "full_outer"
    ).select(
        "proteome_id",
        "db",
        "entry_acc",
        F.coalesce("e_proteins", F.lit(0)).alias("num_proteins"),
        F.coalesce("e_structures", F.lit(0)).alias("num_structures"),
    )
    per_entry = per_entry_base.select(
        F.col("proteome_id").alias("accession"),
        "entry_acc",
        "num_proteins",
        F.concat(
            F.lit('{"proteins":'), F.col("num_proteins"),
            F.lit(',"structures":'), F.col("num_structures"),
            F.lit("}"),
        ).alias("counts"),
    )

    # ---- per-db table ----------------------------------------------
    db_entries = per_entry_base.groupBy("proteome_id", "db").agg(
        F.count("*").alias("db_n_entries")
    )
    per_db = (
        db_entries.join(db_prot, ["proteome_id", "db"], "left")
        .join(db_struct, ["proteome_id", "db"], "left")
        .select(
            F.col("proteome_id").alias("accession"),
            F.col("db").alias("source_database"),
            F.coalesce("db_proteins", F.lit(0)).alias("num_proteins"),
            F.concat(
                F.lit('{"entries":'), F.col("db_n_entries"),
                F.lit(',"proteins":'), F.coalesce("db_proteins", F.lit(0)),
                F.lit(',"structures":'), F.coalesce("db_structures", F.lit(0)),
                F.lit("}"),
            ).alias("counts"),
        )
    )

    # ---- per-proteome table ----------------------------------------
    entries_map = db_entries.groupBy("proteome_id").agg(
        F.sum("db_n_entries").alias("total_entries"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(db, db_n_entries))),"
            " x -> concat('\"', x.db, '\":', x.db_n_entries)), ',')"
        ).alias("per_db_json"),
    )
    structs_all = (
        spine.join(protein_structures, "protein_acc")
        .select("proteome_id", "pdb_id")
        .unionByName(epdb.select("proteome_id", "pdb_id"))
        .distinct()
        .groupBy("proteome_id")
        .agg(F.count("*").alias("n_structures"))
    )
    per_proteome = (
        # inner join on base_agg: only proteomes with >= 1 protein get
        # a row, like the reference's xrefs-store iteration
        proteomes.join(base_agg, "proteome_id")
        .join(entries_map, "proteome_id", "left")
        .join(structs_all, "proteome_id", "left")
        .select(
            F.col("proteome_id").alias("accession"),
            "name",
            F.when(F.col("is_reference"), F.lit(1)).otherwise(F.lit(0)).alias(
                "is_reference"
            ),
            "strain",
            "assembly",
            F.col("taxon_id").alias("taxonomy_id"),
            F.col("n_proteins").alias("num_proteins"),
            F.concat(
                F.lit('{"entries":{"total":'),
                F.coalesce("total_entries", F.lit(0)),
                F.when(
                    F.col("per_db_json").isNotNull() & (F.col("per_db_json") != ""),
                    F.concat(F.lit(","), F.col("per_db_json")),
                ).otherwise(F.lit("")),
                F.lit('},"proteins":'), F.col("n_proteins"),
                F.lit(',"structures":'), F.coalesce("n_structures", F.lit(0)),
                F.lit("}"),
            ).alias("counts"),
        )
    )
    return per_proteome, per_entry, per_db
