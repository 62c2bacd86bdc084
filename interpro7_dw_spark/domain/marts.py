"""Webfront-style mart composition (SURVEY.md Phase 4-5; reference
export-entry2xrefs interpro/xrefs/entries.py:258-505 — its biggest
aggregation, budgeted 16 cpu / 100 GB — plus the taxon / proteome /
structure / clan xrefs marts (interpro/xrefs/{taxa,proteomes,
structures,clans}.py) and the webfront_* count columns
interpro/mysql/*).

The reference accumulates per-key dicts across workers and merges
them recursively (copy_dict), then — for taxa — replays every
taxon's dict into each ancestor's store (taxa.py:207-229). Spark-
first: every xref family is a long-format groupBy from the
protein-keyed join spine; lineage propagation is an ancestor
EXPLODE + re-aggregate (counts roll up in one shuffle instead of
per-taxon dict merges); the mart row re-nests deterministic counts
at write time as canonical sorted strings. One shuffle per family +
one final join per mart — no custom merge code, partial aggregation
everywhere.

Scale notes (100 TB): every aggregate here is partial+final on a
single key family; the ancestor explode multiplies rows by lineage
depth (~a few dozen for real taxonomies) BEFORE a count-distinct
shuffle, which AQE can re-split on skewed root nodes — the root
taxon aggregates every protein, so the distinct-count for it is the
classic hot key; countDistinct over (key, value) pre-dedup handles
it in two stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.json_out import jsonify


def _sorted_join(entries: Column, sep: str = ";") -> Column:
    """Canonical deterministic rendering of a collected string list."""
    return F.array_join(F.array_sort(entries), sep)


def entry_xrefs_mart(
    protein_entries: DataFrame,    # protein_acc, entry_acc
    protein_taxa: DataFrame,       # protein_acc, tax_id
    protein_proteomes: DataFrame,  # protein_acc, proteome_id (nullable rows absent)
    protein_structures: DataFrame, # protein_acc, pdb_id
    protein_ecs: DataFrame | None = None,  # protein_acc, ec
    entry_go: DataFrame | None = None,     # entry_acc, go_id
) -> DataFrame:
    """One row per entry with exact counts and a canonical JSON map of
    per-taxon protein counts (the reference's entry["taxa"] dict,
    interpro/xrefs/entries.py:204-207).

    Optional wirings toward the full webfront entry row:
    - ``protein_ecs`` routes member-protein EC numbers through the
      coverage filter + 3-digit stem fallback (domain/xrefs.py
      filter_ec_numbers; reference uniprot/proteins.py enzyme rules)
      into a sorted ``ec_json`` term list;
    - ``entry_go`` renders the entry's GO terms as a sorted id list
      (reference interpro/ftp/flatfiles.py interpro2go source).
    """
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
    out = (
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
    if protein_ecs is not None:
        from .xrefs import filter_ec_numbers

        eep = (
            base.join(protein_ecs, "protein_acc")
            .select("entry_acc", "ec", "protein_acc")
            .distinct()
        )
        ec_terms = filter_ec_numbers(eep, proteins)
        ec_json = ec_terms.groupBy("entry_acc").agg(
            _sorted_join(F.collect_set("term"), ",").alias("ec_json")
        )
        out = out.join(ec_json, "entry_acc", "left").withColumn(
            "ec_json", F.coalesce("ec_json", F.lit(""))
        )
    if entry_go is not None:
        go_json = entry_go.groupBy("entry_acc").agg(
            _sorted_join(F.collect_set("go_id"), ",").alias("go_json")
        )
        out = out.join(go_json, "entry_acc", "left").withColumn(
            "go_json", F.coalesce("go_json", F.lit(""))
        )
    return out


def _db_nested_counts(matched: DataFrame, key: str) -> DataFrame:
    """The reference's {db: {count, entries: {acc: n}}} accumulator
    (interpro/xrefs/taxa.py:50-73, proteomes.py:50-72) re-expressed as
    two grouped aggregates re-nested into a canonical sorted string
    ``db:count[acc=n,...];...``:

    - ``count``  = proteins counted once per database
      (``databases.add(match_db)`` guard in the reference loop);
    - ``entries[acc]`` = number of match rows for that signature.

    ``matched`` needs columns (key, protein_acc, signature_acc,
    database) — one row per match.
    """
    acc_counts = (
        matched.groupBy(key, "database", "signature_acc")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .groupBy(key, "database")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("signature_acc", "n_matches"))),
                    lambda s: F.concat_ws("=", s["signature_acc"], s["n_matches"]),
                ),
                ",",
            ).alias("accs")
        )
    )
    db_protein_counts = (
        matched.groupBy(key, "database")
        .agg(F.countDistinct("protein_acc").alias("n_prot_db"))
    )
    return (
        acc_counts.join(db_protein_counts, [key, "database"])
        .groupBy(key)
        .agg(
            _sorted_join(
                F.collect_list(
                    F.concat_ws(
                        "", F.col("database"), F.lit(":"), F.col("n_prot_db"),
                        F.lit("["), F.col("accs"), F.lit("]"),
                    )
                )
            ).alias("db_json")
        )
    )


def taxon_xrefs_mart(
    proteins: DataFrame,           # protein_acc, tax_id
    matches: DataFrame,            # protein_acc, signature_acc, database
    protein_proteomes: DataFrame,  # protein_acc, proteome_id
    protein_structures: DataFrame, # protein_acc, pdb_id
    taxon_ancestors: DataFrame,    # tax_id, ancestor  (long lineage incl. self)
) -> DataFrame:
    """taxon2xrefs (reference interpro/xrefs/taxa.py:40-229): per-taxon
    protein / proteome / structure counts and the per-database nested
    entry-count map, WITH lineage propagation — every protein counts
    toward its taxon and every ancestor.

    The reference merges each taxon's dict into its whole lineage
    driver-side (taxa.py:207-229); here the ancestor relation is
    exploded into the join spine before aggregation, so the rollup is
    one shuffle keyed by ancestor and the root's hot key is handled by
    two-stage distinct aggregation.
    """
    spine = proteins.join(taxon_ancestors, "tax_id").select(
        F.col("ancestor").alias("tax_id"), "protein_acc"
    )
    prot_counts = spine.groupBy("tax_id").agg(
        F.count(F.lit(1)).alias("n_proteins")  # proteins have 1 taxon: no dedup needed
    )
    proteome_counts = (
        spine.join(protein_proteomes, "protein_acc")
        .groupBy("tax_id")
        .agg(F.countDistinct("proteome_id").alias("n_proteomes"))
    )
    structure_counts = (
        spine.join(protein_structures, "protein_acc")
        .groupBy("tax_id")
        .agg(F.countDistinct("pdb_id").alias("n_structures"))
    )
    dbs = _db_nested_counts(spine.join(matches, "protein_acc"), "tax_id")
    return (
        prot_counts.join(proteome_counts, "tax_id", "left")
        .join(structure_counts, "tax_id", "left")
        .join(dbs, "tax_id", "left")
        .select(
            "tax_id",
            "n_proteins",
            F.coalesce("n_proteomes", F.lit(0)).alias("n_proteomes"),
            F.coalesce("n_structures", F.lit(0)).alias("n_structures"),
            F.coalesce("db_json", F.lit("")).alias("db_json"),
        )
    )


def proteome_xrefs_mart(
    protein_proteomes: DataFrame,  # protein_acc, proteome_id
    matches: DataFrame,            # protein_acc, signature_acc, database
    protein_structures: DataFrame, # protein_acc, pdb_id
) -> DataFrame:
    """proteome2xrefs (reference interpro/xrefs/proteomes.py:39-90):
    keyed by proteome over the proteins that HAVE one; same per-db
    nested counts; structures.all via the protein->pdb mapping."""
    spine = protein_proteomes.select("proteome_id", "protein_acc")
    prot_counts = spine.groupBy("proteome_id").agg(
        F.count(F.lit(1)).alias("n_proteins")
    )
    structure_counts = (
        spine.join(protein_structures, "protein_acc")
        .groupBy("proteome_id")
        .agg(F.countDistinct("pdb_id").alias("n_structures"))
    )
    dbs = _db_nested_counts(spine.join(matches, "protein_acc"), "proteome_id")
    return (
        prot_counts.join(structure_counts, "proteome_id", "left")
        .join(dbs, "proteome_id", "left")
        .select(
            "proteome_id",
            "n_proteins",
            F.coalesce("n_structures", F.lit(0)).alias("n_structures"),
            F.coalesce("db_json", F.lit("")).alias("db_json"),
        )
    )


def structure_xrefs_mart(
    pdb_matches: DataFrame,        # pdb_id, signature_acc, database
    signature_clans: DataFrame,    # signature_acc, clan_acc
    protein_structures: DataFrame, # protein_acc, pdb_id
    proteins: DataFrame,           # protein_acc, tax_id
    protein_proteomes: DataFrame,  # protein_acc, proteome_id
    protein_domorgs: DataFrame,    # protein_acc, dom_id
) -> DataFrame:
    """structure2xrefs (reference interpro/xrefs/structures.py:40-122):
    per PDB structure — entry sets per database (rendered canonically),
    clan ('sets') count via the member->clan dim, and the protein-side
    rollups (proteins, taxa, proteomes, domain organisations) from the
    protein->pdb mapping."""
    entries = (
        pdb_matches.groupBy("pdb_id", "database")
        .agg(F.countDistinct("signature_acc").alias("n_accs"))
        .groupBy("pdb_id")
        .agg(
            F.sum("n_accs").cast("long").alias("n_entries"),
            _sorted_join(
                F.collect_list(F.concat_ws("", F.col("database"), F.lit(":"), F.col("n_accs")))
            ).alias("entries_json"),
        )
    )
    clans = (
        pdb_matches.join(F.broadcast(signature_clans), "signature_acc")
        .groupBy("pdb_id")
        .agg(F.countDistinct("clan_acc").alias("n_sets"))
    )
    prot_side = (
        protein_structures.join(proteins, "protein_acc")
        .join(protein_proteomes, "protein_acc", "left")
        .join(protein_domorgs, "protein_acc", "left")
        .groupBy("pdb_id")
        .agg(
            F.countDistinct("protein_acc").alias("n_proteins"),
            F.countDistinct("tax_id").alias("n_taxa"),
            F.countDistinct("proteome_id").alias("n_proteomes"),
            F.countDistinct("dom_id").alias("n_dom_orgs"),
        )
    )
    return (
        entries.join(clans, "pdb_id", "left")
        .join(prot_side, "pdb_id", "left")
        .select(
            "pdb_id",
            "n_entries",
            "entries_json",
            F.coalesce("n_sets", F.lit(0)).alias("n_sets"),
            F.coalesce("n_proteins", F.lit(0)).alias("n_proteins"),
            F.coalesce("n_taxa", F.lit(0)).alias("n_taxa"),
            F.coalesce("n_proteomes", F.lit(0)).alias("n_proteomes"),
            F.coalesce("n_dom_orgs", F.lit(0)).alias("n_dom_orgs"),
        )
    )


def clan_xrefs_mart(
    matches: DataFrame,             # protein_acc, signature_acc, database
    signature_clans: DataFrame,     # signature_acc, clan_acc
    proteins: DataFrame,            # protein_acc, tax_id
    protein_proteomes: DataFrame,   # protein_acc, proteome_id
    domorg_members: DataFrame,      # protein_acc, signature_acc, dom_id
    entry_structures: DataFrame,    # signature_acc, pdb_id
) -> DataFrame:
    """clan2xrefs (reference interpro/xrefs/clans.py:41-137): matches
    whose signature belongs to a clan roll up per clan —

    - ``n_entries``       distinct member signatures actually matched;
    - ``n_protein_matches`` match rows (the reference APPENDS to a
      protein list per match, clans.py:69 — duplicates intended);
    - ``n_proteins``      distinct proteins;
    - ``n_proteomes`` / ``n_taxa`` distinct via the protein dims;
    - ``n_dom_orgs``      domain organisations whose members include
      the matched signature (clans.py:59-60);
    - ``n_structures``    union of the member entries' structures —
      the reference pops entry2structures once per signature
      (clans.py:74-79), which is set-union semantics: distinct pdb
      over matched member signatures.
    """
    cm = matches.join(F.broadcast(signature_clans), "signature_acc")
    base = (
        cm.join(proteins, "protein_acc")
        .join(protein_proteomes, "protein_acc", "left")
        .groupBy("clan_acc")
        .agg(
            F.countDistinct("signature_acc").alias("n_entries"),
            F.count(F.lit(1)).alias("n_protein_matches"),
            F.countDistinct("protein_acc").alias("n_proteins"),
            F.countDistinct("proteome_id").alias("n_proteomes"),
            F.countDistinct("tax_id").alias("n_taxa"),
        )
    )
    domorgs = (
        cm.join(domorg_members, ["protein_acc", "signature_acc"])
        .groupBy("clan_acc")
        .agg(F.countDistinct("dom_id").alias("n_dom_orgs"))
    )
    structures = (
        cm.select("clan_acc", "signature_acc")
        .distinct()
        .join(entry_structures, "signature_acc")
        .groupBy("clan_acc")
        .agg(F.countDistinct("pdb_id").alias("n_structures"))
    )
    return (
        base.join(domorgs, "clan_acc", "left")
        .join(structures, "clan_acc", "left")
        .select(
            "clan_acc",
            "n_entries",
            "n_protein_matches",
            "n_proteins",
            "n_proteomes",
            "n_taxa",
            F.coalesce("n_dom_orgs", F.lit(0)).alias("n_dom_orgs"),
            F.coalesce("n_structures", F.lit(0)).alias("n_structures"),
        )
    )
