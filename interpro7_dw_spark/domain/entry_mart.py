"""webfront_entry mart — the one-row-per-entry composition behind the
reference's biggest MySQL deliverable (reference
interpro/mysql/entries.py:163-562, ``populate_entries``): entry
attributes plus every derived block —

- ``member_databases``: per InterPro entry, its member signatures
  nested by database, value = name | short_name | accession
  (entries.py:212-233); integrations whose target is not an InterPro
  entry (PANTHER / FunFam hierarchies) are skipped (:217-220);
- ``hierarchy``: nested root-based entry tree for InterPro entries,
  subfamily counts for PANTHER / CATH-Gene3D signatures
  (make_hierarchy / get_hierarchy / format_node, :96-154, :337);
- ``history``: old names, old short names, and old integrations with
  LOWER-CASED database keys (:304-320);
- ``cross_references``: keys forced to lower case (:316-319) with the
  xrefs' EC numbers merged in sorted under ``ec`` (:291-293);
- ``pathways``: metacyc/reactome id+name lists (:295-299);
- ``overlaps_with``: both directions of the overlapping-entry pairs
  with the other entry's name and lower-cased type (:190-207);
- ``set_info``: the entry's clan accession/name (:169-174);
- ``representative_structure``: best (coverage, resolution) structure
  among high-resolution ones (coverage floor 0.5, resolution cap 2;
  :13-14, :178-185, :321-336);
- ``counts``: the 11-key JSON in the reference's insertion order
  (:376-389), with per-entry protein / taxon / proteome / structure /
  match / domain-architecture / AlphaFold rollups re-derived from
  long-format match facts instead of the hand-merged xref dicts.

Documented canonicalizations (the reference iterates dicts/sets whose
order is load-dependent): member lists, cross-reference ids, pathway
items and overlap lists are sorted; the representative-structure tie
(equal coverage AND equal resolution) breaks on the larger pdb_id;
interaction counts come from the IntAct input for every entry (the
reference's no-xrefs fallback loop counts ``entry.ppi`` instead,
entries.py:461 — an always-empty field in practice).

Every JSON-ish block renders NULL when empty, matching ``jsonify``'s
``nullable=True`` empty→NULL rule (interpro/mysql/utils.py:30-34).

Scale shape: one shuffle per fact aggregation keyed by entry, every
dim-sized block broadcast; the hierarchy kernel runs driver-side on
the collected entry dim exactly like the reference's pickled-dict
broadcast (entries are dimension-sized; the fact tables are not).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPR_STRUCT_MIN_COVERAGE = 0.5  # entries.py:13
REPR_STRUCT_MAX_RESOLUTION = 2.0  # entries.py:14


def entry_hierarchy(entries: DataFrame) -> DataFrame:
    """Per-entry hierarchy JSON + subfamily count (reference
    make_hierarchy / get_hierarchy / format_node, entries.py:96-154).

    Driver-side over the collected dim — the reference broadcasts the
    whole entries pickle; hierarchies are dimension-sized. Returns
    (entry_acc, hierarchy_json, n_subfamilies):

    - non-public or deleted entries get (NULL, 0) but still appear as
      nodes inside other entries' trees (make_hierarchy builds
      parent2children from ALL entries, :96-106);
    - InterPro entries: JSON of the tree from their root, children
      sorted by accession, ``children`` key always present;
    - PANTHER / CATH-Gene3D entries: NULL tree, n_subfamilies = number
      of children of their root (get_hierarchy, :137-143);
    - everything else: (NULL, 0).
    """
    rows = entries.select(
        "entry_acc", "name", "type", "database", "parent_acc", "public",
        "deletion_date",
    ).collect()
    info = {r.entry_acc: r for r in rows}
    child2parent = {r.entry_acc: r.parent_acc for r in rows if r.parent_acc}
    parent2children: dict[str, list[str]] = {}
    for r in rows:
        if r.parent_acc:
            parent2children.setdefault(r.parent_acc, []).append(r.entry_acc)

    def format_node(acc: str) -> dict:
        r = info[acc]
        return {
            "accession": acc,
            "name": r.name,
            "type": r.type,
            "children": [
                format_node(c) for c in sorted(parent2children.get(acc, []))
            ],
        }

    out = []
    for r in rows:
        if r.deletion_date is not None or not r.public:
            out.append((r.entry_acc, None, 0))
            continue
        acc = r.entry_acc
        while child2parent.get(acc):
            acc = child2parent[acc]
        db = (r.database or "").lower()
        if db == "interpro":
            tree = format_node(acc)
            out.append((r.entry_acc, json.dumps(tree, separators=(",", ":")), 0))
        elif db in ("cathgene3d", "panther"):
            out.append((r.entry_acc, None, len(parent2children.get(acc, []))))
        else:
            out.append((r.entry_acc, None, 0))
    return entries.sparkSession.createDataFrame(
        out, "entry_acc string, hierarchy_json string, n_subfamilies int"
    )


def webfront_entry_mart(
    entries: DataFrame,
    matches: DataFrame,
    entry_structures: DataFrame,
    structures_dim: DataFrame,
    entry_enzymes: DataFrame | None = None,
    entry_pathways: DataFrame | None = None,
    entry_interactions: DataFrame | None = None,
    entry_clans: DataFrame | None = None,
    overlapping: DataFrame | None = None,
) -> DataFrame:
    """Compose the webfront_entry rows (see module docstring).

    Inputs:
    - ``entries`` dim: entry_acc, name, short_name, type, database,
      integrated_in, parent_acc, public (bool), creation_date,
      deletion_date (nullable strings), old_names array<string>,
      old_short_names array<string>, old_integrations
      array<struct<db string, entry_acc string>>, cross_references
      array<struct<ref_db string, ref_id string>>;
    - ``matches`` fact at match-row grain: entry_acc, protein_acc,
      tax_id, proteome_id (nullable), dom_id (nullable), in_alphafold
      (bool) — the counts re-derive from it;
    - ``entry_structures``: entry_acc, pdb_id, coverage;
    - ``structures_dim``: pdb_id, s_name, resolution (nullable) — the
      high-resolution filter happens here like the reference's load
      (entries.py:178-185);
    - optional: entry_enzymes (entry_acc, ec), entry_pathways
      (entry_acc, pathway_db, pathway_id, pathway_name),
      entry_interactions (entry_acc, intact_id), entry_clans
      (entry_acc, clan_acc, clan_name), overlapping (acc_1, acc_2).
    """
    # ---- fact rollups, one shuffle each, keyed by entry ------------
    agg = matches.groupBy("entry_acc").agg(
        F.count("*").alias("n_matches"),
        F.countDistinct("protein_acc").alias("n_proteins"),
        F.countDistinct("tax_id").alias("n_taxa"),
        F.countDistinct("proteome_id").alias("n_proteomes"),
        F.countDistinct("dom_id").alias("n_dom_archs"),
        F.countDistinct(
            F.when(F.col("in_alphafold"), F.col("protein_acc"))
        ).alias("n_af"),
    )

    # n_structures counts (pdb, ratio) TUPLES — xrefs["structures"] is
    # a set of pairs and the reference takes its len (entries.py:383)
    sagg = entry_structures.groupBy("entry_acc").agg(
        F.countDistinct("pdb_id", "coverage").alias("n_structures")
    )

    highres = structures_dim.filter(
        F.col("resolution").isNotNull()
        & (F.col("resolution") <= F.lit(REPR_STRUCT_MAX_RESOLUTION))
    )
    # admission replays the loop floor (entries.py:321-335): coverage
    # above the floor admits any high-res candidate; coverage AT the
    # floor requires resolution strictly under the cap
    adm = entry_structures.join(F.broadcast(highres), "pdb_id").filter(
        (F.col("coverage") > F.lit(REPR_STRUCT_MIN_COVERAGE))
        | (
            (F.col("coverage") == F.lit(REPR_STRUCT_MIN_COVERAGE))
            & (F.col("resolution") < F.lit(REPR_STRUCT_MAX_RESOLUTION))
        )
    )
    pick = F.struct(
        F.col("coverage"), (-F.col("resolution")).alias("neg_res"), F.col("pdb_id")
    )
    repr_struct = adm.groupBy("entry_acc").agg(
        F.max_by("pdb_id", pick).alias("repr_pdb"),
        F.max_by("s_name", pick).alias("repr_name"),
    )

    # ---- member_databases (entries.py:212-233) ---------------------
    target_db = F.broadcast(
        entries.select(
            F.col("entry_acc").alias("integrated_in"),
            F.lower("database").alias("target_db"),
        )
    )
    member_sigs = (
        entries.filter(F.col("integrated_in").isNotNull())
        .select(
            "integrated_in",
            F.lower("database").alias("db"),
            F.col("entry_acc").alias("sig_acc"),
            F.coalesce("name", "short_name", "entry_acc").alias("sig_val"),
        )
        .join(target_db, "integrated_in")
        .filter(F.col("target_db") == "interpro")
    )
    mdb = (
        member_sigs.groupBy(F.col("integrated_in").alias("entry_acc"), "db")
        .agg(
            F.expr(
                "array_join(array_sort(collect_list(concat(sig_acc, '=', sig_val))), ',')"
            ).alias("accs")
        )
        .groupBy("entry_acc")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(db, accs))),"
                " x -> concat(x.db, ':[', x.accs, ']')), ';')"
            ).alias("member_databases")
        )
    )

    # ---- history (entries.py:304-320): lower-cased signature keys --
    names_part = F.when(
        F.size("old_names") > 0,
        F.concat(F.lit("names:["), F.array_join("old_names", ";"), F.lit("]")),
    )
    sn_part = F.when(
        F.size("old_short_names") > 0,
        F.concat(
            F.lit("short_names:["), F.array_join("old_short_names", ";"), F.lit("]")
        ),
    )
    sig_part = F.when(
        F.size("old_integrations") > 0,
        F.concat(
            F.lit("signatures:{"),
            F.expr(
                "array_join(transform(array_sort(transform(old_integrations,"
                " x -> struct(lower(x.db) as db, x.entry_acc as e))),"
                " x -> concat(x.db, '=', x.e)), ',')"
            ),
            F.lit("}"),
        ),
    )
    history = F.concat_ws("|", names_part, sn_part, sig_part)
    history = F.when(F.length(history) > 0, history)  # jsonify empty -> NULL

    # ---- cross_references: lower keys + merged sorted ec -----------
    xr = entries.select(
        "entry_acc", F.explode("cross_references").alias("x")
    ).select("entry_acc", F.lower("x.ref_db").alias("db"), F.col("x.ref_id").alias("rid"))
    if entry_enzymes is not None:
        xr = xr.unionByName(
            entry_enzymes.select(
                "entry_acc", F.lit("ec").alias("db"), F.col("ec").alias("rid")
            )
        )
    xragg = (
        xr.groupBy("entry_acc", "db")
        .agg(F.expr("array_join(array_sort(collect_list(rid)), ',')").alias("ids"))
        .groupBy("entry_acc")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(db, ids))),"
                " x -> concat(x.db, ':', x.ids)), ';')"
            ).alias("cross_refs")
        )
    )

    # ---- pathways (entries.py:295-299, counts :380) ----------------
    pwagg = None
    if entry_pathways is not None:
        pwagg = (
            entry_pathways.groupBy("entry_acc", F.lower("pathway_db").alias("db"))
            .agg(
                F.expr(
                    "array_join(array_sort(collect_list(concat(pathway_id, '=', pathway_name))), ',')"
                ).alias("items"),
                F.count("*").alias("n"),
            )
            .groupBy("entry_acc")
            .agg(
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct(db, items))),"
                    " x -> concat(x.db, ':[', x.items, ']')), ';')"
                ).alias("pathways_str"),
                F.sum("n").alias("n_pathways"),
            )
        )

    # ---- overlaps_with: both directions (entries.py:190-207) -------
    ovagg = None
    if overlapping is not None:
        both = overlapping.select(
            F.col("acc_1").alias("entry_acc"), F.col("acc_2").alias("other")
        ).unionByName(
            overlapping.select(
                F.col("acc_2").alias("entry_acc"), F.col("acc_1").alias("other")
            )
        )
        other_dim = F.broadcast(
            entries.select(
                F.col("entry_acc").alias("other"),
                F.col("name").alias("o_name"),
                F.lower("type").alias("o_type"),
            )
        )
        ovagg = (
            both.join(other_dim, "other")
            .groupBy("entry_acc")
            .agg(
                F.expr(
                    "array_join(array_sort(collect_list(concat(other, '=', o_name, '=', o_type))), ',')"
                ).alias("overlaps_str")
            )
        )

    ppi = None
    if entry_interactions is not None:
        ppi = entry_interactions.groupBy("entry_acc").agg(
            F.count("*").alias("n_interactions")
        )

    hier = F.broadcast(entry_hierarchy(entries))

    base = entries.select(
        "entry_acc",
        F.lower("type").alias("entry_type"),
        "name",
        "short_name",
        F.lower("database").alias("source_database"),
        F.col("integrated_in").alias("integrated_id"),
        "creation_date",
        "deletion_date",
        history.alias("history"),
    )
    df = (
        base.join(F.broadcast(mdb), "entry_acc", "left")
        .join(hier, "entry_acc", "left")
        .join(F.broadcast(xragg), "entry_acc", "left")
        .join(agg, "entry_acc", "left")
        .join(sagg, "entry_acc", "left")
        .join(repr_struct, "entry_acc", "left")
    )
    if pwagg is not None:
        df = df.join(F.broadcast(pwagg), "entry_acc", "left")
    else:
        df = df.withColumn("pathways_str", F.lit(None).cast("string")).withColumn(
            "n_pathways", F.lit(None).cast("long")
        )
    if ovagg is not None:
        df = df.join(F.broadcast(ovagg), "entry_acc", "left")
    else:
        df = df.withColumn("overlaps_str", F.lit(None).cast("string"))
    if ppi is not None:
        df = df.join(F.broadcast(ppi), "entry_acc", "left")
    else:
        df = df.withColumn("n_interactions", F.lit(None).cast("long"))
    if entry_clans is not None:
        df = df.join(
            F.broadcast(entry_clans.select("entry_acc", "set_acc", "set_name")),
            "entry_acc",
            "left",
        )
    else:
        df = df.withColumn("set_acc", F.lit(None).cast("string")).withColumn(
            "set_name", F.lit(None).cast("string")
        )

    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    counts_json = F.concat(
        F.lit('{"subfamilies":'), F.coalesce("n_subfamilies", F.lit(0)).cast("long"),
        F.lit(',"domain_architectures":'), z("n_dom_archs"),
        F.lit(',"interactions":'), z("n_interactions"),
        F.lit(',"matches":'), z("n_matches"),
        F.lit(',"pathways":'), z("n_pathways"),
        F.lit(',"proteins":'), z("n_proteins"),
        F.lit(',"proteomes":'), z("n_proteomes"),
        F.lit(',"sets":'), F.when(F.col("set_acc").isNotNull(), 1).otherwise(0),
        F.lit(',"structural_models":{"alphafold":'), z("n_af"),
        F.lit('},"structures":'), z("n_structures"),
        F.lit(',"taxa":'), z("n_taxa"),
        F.lit("}"),
    )
    return df.select(
        "entry_acc",
        "entry_type",
        "name",
        "short_name",
        "source_database",
        "integrated_id",
        "creation_date",
        "deletion_date",
        "member_databases",
        "hierarchy_json",
        F.coalesce("n_subfamilies", F.lit(0)).alias("n_subfamilies"),
        "history",
        "cross_refs",
        "pathways_str",
        "overlaps_str",
        "set_acc",
        "set_name",
        "repr_pdb",
        "repr_name",
        counts_json.alias("counts_json"),
    )
