"""The count PYRAMID of :mod:`.mart_ivm`, instantiated for the
remaining xrefs marts — clan2xrefs and proteome2xrefs (reference
`/root/reference/interpro7dw/cli.py:323` export-clan2xrefs <=6h/32GB,
`cli.py:379` export-proteome2xrefs <=6h/100GB; the full-rebuild
compositions live in :mod:`.marts`). Same discipline throughout:

- every mart column is a count of support rows (or a maintained count
  value), so one primitive — the count-IVM merge — maintains all;
- facts-scale supports merge PRUNED (broadcast semi/anti on the
  delta's touched proteins) and emit enter/exit TRANSITIONS that
  maintain the aggregate-sized level-2 distinct counts the renders
  read (``apply_count_delta_pruned_with_transitions``);
- renders never re-aggregate a facts-scale relation.

**Clan mart** (changelog: the MATCH changelog only — clan membership,
protein dims, domain organisations and entry->structure maps are
release-static): the signed match delta routes through the broadcast
member->clan dim once, then feeds every support. Two pyramid
compositions beyond the plain rollup:

- ``n_proteins`` is the row count of the facts-scale
  ``sup_c_prot(clan, protein)``, maintained as level-2 ``sup_c_np``
  from its transitions;
- ``n_structures`` is the row count of ``sup_c_pdb(clan, pdb)``,
  whose counts are *#matched member signatures referencing the pdb* —
  maintained by JOINING the ``sup_c_sig`` transitions (a signature
  entering/exiting the clan's matched set) against the static
  entry->structure dim: a TRANSITION-DRIVEN JOIN DELTA, the exact
  set-union ("pop once per signature") semantics of the reference
  (interpro/xrefs/clans.py:74-79) without ever rescanning matches.

**Proteome mart** (changelogs: the protein->proteome assignment AND
the match changelog, composed by the bilinear rule dV = dM |><| PP_new
+ M_old |><| dPP, both sides |delta|-pruned semi-joins): same support
shapes as the taxon mart minus the ancestor lift; the facts-scale
``sup_p_prot_db`` maintains the level-2 ``sup_p_db`` the db_json
render reads.

Both maintained renders reproduce their full-rebuild twins
(:func:`..domain.marts.clan_xrefs_mart` /
:func:`..domain.marts.proteome_xrefs_mart`) column for column — the
``z_ivm_mart_clan2xrefs`` / ``z_ivm_mart_proteome2xrefs`` specs
oracle them against the full DuckDB recompute of the new release.

Scope note (matches the reference's processing model): changelog rows
reference proteins present in the static protein dim, and each
protein carries at most one proteome — the invariants the reference's
own stores guarantee by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from collections.abc import Mapping

from ..caching import owned_persist
from .mart_ivm import (
    MartPyramid,
    Rollup,
    _count,
    _merge_supports,
    _signed_match_delta,
    seed_level2,
)
from .marts import _sorted_join

# --------------------------------------------------------------- clan

CLAN_SUPPORT_NAMES = (
    "sup_c_nm", "sup_c_sig", "sup_c_prot", "sup_c_proteome",
    "sup_c_tax", "sup_c_dom", "sup_c_pdb", "sup_c_np",
)

CLAN_SUPPORT_KEYS: dict[str, list[str]] = {
    "sup_c_nm": ["clan_acc"],
    "sup_c_sig": ["clan_acc", "signature_acc"],
    "sup_c_prot": ["clan_acc", "protein_acc"],
    "sup_c_proteome": ["clan_acc", "proteome_id"],
    "sup_c_tax": ["clan_acc", "tax_id"],
    "sup_c_dom": ["clan_acc", "dom_id"],
    "sup_c_pdb": ["clan_acc", "pdb_id"],
    "sup_c_np": ["clan_acc"],
}

# the one facts-scale clan support (≈ |matched proteins| × clans-per-
# protein) and its level-2 rollup
CLAN_BUCKETED_SUPPORTS: dict[str, str] = {"sup_c_prot": "protein_acc"}


def _clan_pdb_delta(trans: DataFrame, dims: Mapping[str, DataFrame]) -> DataFrame:
    """The transition-driven JOIN delta of the clan structure counts:
    a signature entering/exiting the clan's matched set adds/removes
    exactly its structures' refs (the reference's pop-once set union,
    interpro/xrefs/clans.py:74-79) — never a match rescan."""
    return trans.join(
        F.broadcast(dims["entry_structures"]), "signature_acc"
    ).select("clan_acc", "pdb_id", "s")


CLAN_LEVEL2_ROLLUPS: dict[str, Rollup] = {
    "sup_c_prot": Rollup("sup_c_np", ("clan_acc",)),
    "sup_c_sig": Rollup(
        "sup_c_pdb", ("clan_acc", "signature_acc"), transform=_clan_pdb_delta
    ),
}

CLAN_PYRAMID = MartPyramid(
    name="clan",
    support_keys=CLAN_SUPPORT_KEYS,
    bucketed=CLAN_BUCKETED_SUPPORTS,
    rollups=CLAN_LEVEL2_ROLLUPS,
)


def seed_clan_supports(
    matches: DataFrame,            # protein_acc, signature_acc, database
    signature_clans: DataFrame,    # signature_acc, clan_acc
    proteins: DataFrame,           # protein_acc, tax_id
    protein_proteomes: DataFrame,  # protein_acc, proteome_id
    domorg_members: DataFrame,     # protein_acc, signature_acc, dom_id
    entry_structures: DataFrame,   # signature_acc, pdb_id (distinct)
) -> dict[str, DataFrame]:
    """Full aggregation of the clan-mart supports from a base release
    — run once, then maintained forever. ``cm`` (matches routed
    through the broadcast clan dim) persists for the branching
    aggregates; released by the consumer's engine_cache_scope."""
    cm = owned_persist(
        matches.join(F.broadcast(signature_clans), "signature_acc")
    )
    sup = {
        "sup_c_nm": _count(cm.select("clan_acc"), ["clan_acc"]),
        "sup_c_sig": _count(cm, CLAN_SUPPORT_KEYS["sup_c_sig"]),
        "sup_c_prot": _count(cm, CLAN_SUPPORT_KEYS["sup_c_prot"]),
        "sup_c_proteome": _count(
            cm.join(protein_proteomes, "protein_acc"),
            CLAN_SUPPORT_KEYS["sup_c_proteome"],
        ),
        "sup_c_tax": _count(
            cm.join(proteins, "protein_acc"),
            CLAN_SUPPORT_KEYS["sup_c_tax"],
        ),
        "sup_c_dom": _count(
            cm.join(domorg_members, ["protein_acc", "signature_acc"]),
            CLAN_SUPPORT_KEYS["sup_c_dom"],
        ),
    }
    return seed_level2(
        sup, CLAN_PYRAMID, dims={"entry_structures": entry_structures}
    )


def clan_support_deltas(
    delta_m: DataFrame,            # snapshot_delta_images over matches (keyed match_id)
    signature_clans: DataFrame,
    proteins: DataFrame,
    protein_proteomes: DataFrame,
    domorg_members: DataFrame,
) -> dict[str, DataFrame]:
    """The signed support deltas of one clan-mart epoch: the signed
    match delta routes through the broadcast clan dim once (``dcm``
    persists — every support folds it; released by the consumer's
    engine_cache_scope), then joins each protein-keyed static dim. The
    two level-2 supports (sup_c_np, sup_c_pdb) have no delta here —
    their whole delta is the level-1 transitions, the pdb one through
    :func:`_clan_pdb_delta`'s join against the static
    entry->structure dim."""
    dm = _signed_match_delta(delta_m)
    dcm = owned_persist(
        dm.join(F.broadcast(signature_clans), "signature_acc")
    )
    return {
        "sup_c_nm": dcm.select("clan_acc", "s"),
        "sup_c_sig": dcm.select("clan_acc", "signature_acc", "s"),
        "sup_c_prot": dcm.select("clan_acc", "protein_acc", "s"),
        "sup_c_proteome": dcm.join(protein_proteomes, "protein_acc").select(
            "clan_acc", "proteome_id", "s"
        ),
        "sup_c_tax": dcm.join(proteins, "protein_acc").select(
            "clan_acc", "tax_id", "s"
        ),
        "sup_c_dom": dcm.join(
            domorg_members, ["protein_acc", "signature_acc"]
        ).select("clan_acc", "dom_id", "s"),
    }


def maintain_clan_supports(
    supports: dict[str, DataFrame],
    delta_m: DataFrame,
    signature_clans: DataFrame,
    proteins: DataFrame,
    protein_proteomes: DataFrame,
    domorg_members: DataFrame,
    entry_structures: DataFrame,
) -> dict[str, DataFrame]:
    """One clan-mart IVM epoch: :func:`clan_support_deltas` composed
    with the shared pyramid merge — the facts-scale sup_c_prot merges
    pruned and rolls up to sup_c_np; sup_c_sig's transitions drive
    the sup_c_pdb join delta (both declared in CLAN_PYRAMID)."""
    deltas = clan_support_deltas(
        delta_m, signature_clans, proteins, protein_proteomes,
        domorg_members,
    )
    return _merge_supports(
        supports, deltas, CLAN_PYRAMID,
        dims={"entry_structures": entry_structures},
    )


def clan_mart_from_supports(supports: dict[str, DataFrame]) -> DataFrame:
    """Render the maintained clan supports into
    :func:`..domain.marts.clan_xrefs_mart`'s exact output. Cost: one
    pass over each aggregate-sized support — ``n_proteins`` reads the
    level-2 ``sup_c_np``, never the facts-scale ``sup_c_prot``."""
    nm = supports["sup_c_nm"].select(
        "clan_acc", F.col("n").alias("n_protein_matches")
    )
    n_entries = supports["sup_c_sig"].groupBy("clan_acc").agg(
        F.count(F.lit(1)).alias("n_entries")
    )
    np_ = supports["sup_c_np"].select("clan_acc", F.col("n").alias("n_proteins"))
    n_proteomes = supports["sup_c_proteome"].groupBy("clan_acc").agg(
        F.count(F.lit(1)).alias("n_proteomes")
    )
    n_taxa = supports["sup_c_tax"].groupBy("clan_acc").agg(
        F.count(F.lit(1)).alias("n_taxa")
    )
    n_dom = supports["sup_c_dom"].groupBy("clan_acc").agg(
        F.count(F.lit(1)).alias("n_dom_orgs")
    )
    n_struct = supports["sup_c_pdb"].groupBy("clan_acc").agg(
        F.count(F.lit(1)).alias("n_structures")
    )
    return (
        nm.join(n_entries, "clan_acc", "left")
        .join(np_, "clan_acc", "left")
        .join(n_proteomes, "clan_acc", "left")
        .join(n_taxa, "clan_acc", "left")
        .join(n_dom, "clan_acc", "left")
        .join(n_struct, "clan_acc", "left")
        .select(
            "clan_acc",
            F.coalesce("n_entries", F.lit(0)).alias("n_entries"),
            "n_protein_matches",
            F.coalesce("n_proteins", F.lit(0)).alias("n_proteins"),
            F.coalesce("n_proteomes", F.lit(0)).alias("n_proteomes"),
            F.coalesce("n_taxa", F.lit(0)).alias("n_taxa"),
            F.coalesce("n_dom_orgs", F.lit(0)).alias("n_dom_orgs"),
            F.coalesce("n_structures", F.lit(0)).alias("n_structures"),
        )
    )


# ----------------------------------------------------------- proteome

PROTEOME_SUPPORT_NAMES = (
    "sup_p_n", "sup_p_pdb", "sup_p_sig", "sup_p_prot_db", "sup_p_db",
)

PROTEOME_SUPPORT_KEYS: dict[str, list[str]] = {
    "sup_p_n": ["proteome_id"],
    "sup_p_pdb": ["proteome_id", "pdb_id"],
    "sup_p_sig": ["proteome_id", "database", "signature_acc"],
    "sup_p_prot_db": ["proteome_id", "database", "protein_acc"],
    "sup_p_db": ["proteome_id", "database"],
}

PROTEOME_BUCKETED_SUPPORTS: dict[str, str] = {"sup_p_prot_db": "protein_acc"}
PROTEOME_LEVEL2_ROLLUPS: dict[str, Rollup] = {
    "sup_p_prot_db": Rollup("sup_p_db", ("proteome_id", "database")),
}

PROTEOME_PYRAMID = MartPyramid(
    name="proteome",
    support_keys=PROTEOME_SUPPORT_KEYS,
    bucketed=PROTEOME_BUCKETED_SUPPORTS,
    rollups=PROTEOME_LEVEL2_ROLLUPS,
)


def seed_proteome_supports(
    protein_proteomes: DataFrame,  # protein_acc, proteome_id
    matches: DataFrame,            # protein_acc, signature_acc, database
    protein_structures: DataFrame, # protein_acc, pdb_id
) -> dict[str, DataFrame]:
    """Full aggregation of the proteome-mart supports from a base
    release; ``matched`` persists for the two match-side aggregates."""
    spine = protein_proteomes.select("proteome_id", "protein_acc")
    matched = owned_persist(spine.join(matches, "protein_acc"))
    sup = {
        "sup_p_n": _count(spine.select("proteome_id"), ["proteome_id"]),
        "sup_p_pdb": _count(
            spine.join(protein_structures, "protein_acc"),
            PROTEOME_SUPPORT_KEYS["sup_p_pdb"],
        ),
        "sup_p_sig": _count(matched, PROTEOME_SUPPORT_KEYS["sup_p_sig"]),
        "sup_p_prot_db": _count(
            matched, PROTEOME_SUPPORT_KEYS["sup_p_prot_db"]
        ),
    }
    return seed_level2(sup, PROTEOME_PYRAMID)


def _signed_pp_delta(delta_pp: DataFrame) -> DataFrame:
    """protein->proteome assignment changelog (keyed protein_acc) ->
    signed (protein_acc, proteome_id, s) rows."""
    retract = delta_pp.filter(
        F.col("change_type").isin("delete", "update")
    ).select(
        "protein_acc",
        F.col("old_proteome_id").alias("proteome_id"),
        F.lit(-1).cast("long").alias("s"),
    )
    add = delta_pp.filter(F.col("change_type").isin("insert", "update")).select(
        "protein_acc",
        F.col("new_proteome_id").alias("proteome_id"),
        F.lit(1).cast("long").alias("s"),
    )
    return retract.unionByName(add)


def proteome_support_deltas(
    delta_pp: DataFrame,           # snapshot_delta_images over protein_proteomes (keyed protein_acc)
    delta_m: DataFrame,            # snapshot_delta_images over matches (keyed match_id)
    pp_new: DataFrame,             # the NEW assignment snapshot
    matches_old: DataFrame,        # the OLD match snapshot (pruned-rescan source)
    protein_structures: DataFrame,
) -> dict[str, DataFrame]:
    """The signed support deltas of one proteome-mart epoch — the
    bilinear rule with D = the protein->proteome assignment and F =
    matches: dM joins PP_new pruned to dM's proteins; M_old joins dPP
    pruned to dPP's proteins. ``dpp``/``d_matched`` persist (multiple
    consumers); released by the consumer's engine_cache_scope."""
    dpp = owned_persist(_signed_pp_delta(delta_pp))
    # (r15 measured: persisting dm / broadcasting the touched-protein
    # prunes is NEGATIVE here, exactly as in the taxon builder — the
    # recomputed match-delta branches overlap better than a persist
    # barrier + broadcast build serializes; see OPTIMIZATION_r15)
    dm = _signed_match_delta(delta_m)

    pp_touched = pp_new.join(
        dm.select("protein_acc").distinct(), "protein_acc", "left_semi"
    )
    part1 = dm.join(pp_touched, "protein_acc").select(
        "proteome_id", "database", "signature_acc", "protein_acc", "s"
    )
    m_old_touched = matches_old.join(
        dpp.select("protein_acc").distinct(), "protein_acc", "left_semi"
    )
    part2 = m_old_touched.join(dpp, "protein_acc").select(
        "proteome_id", "database", "signature_acc", "protein_acc", "s"
    )
    d_matched = owned_persist(part1.unionByName(part2))
    return {
        "sup_p_n": dpp.select("proteome_id", "s"),
        "sup_p_pdb": dpp.join(protein_structures, "protein_acc").select(
            "proteome_id", "pdb_id", "s"
        ),
        "sup_p_sig": d_matched.select(
            "proteome_id", "database", "signature_acc", "s"
        ),
        "sup_p_prot_db": d_matched.select(
            "proteome_id", "database", "protein_acc", "s"
        ),
    }


def maintain_proteome_supports(
    supports: dict[str, DataFrame],
    delta_pp: DataFrame,
    delta_m: DataFrame,
    pp_new: DataFrame,
    matches_old: DataFrame,
    protein_structures: DataFrame,
) -> dict[str, DataFrame]:
    """One proteome-mart IVM epoch: :func:`proteome_support_deltas`
    composed with the merges — the facts-scale ``sup_p_prot_db``
    through the pruned transitions merge maintaining the level-2
    ``sup_p_db``."""
    deltas = proteome_support_deltas(
        delta_pp, delta_m, pp_new, matches_old, protein_structures
    )
    return _merge_supports(supports, deltas, PROTEOME_PYRAMID)


def proteome_mart_from_supports(supports: dict[str, DataFrame]) -> DataFrame:
    """Render the maintained proteome supports into
    :func:`..domain.marts.proteome_xrefs_mart`'s exact output
    (proteome_id, n_proteins, n_structures, db_json) — identical
    canonical db_json, n_prot_db from the maintained level-2
    ``sup_p_db``; no facts-scale relation in the render plan."""
    prot = supports["sup_p_n"].select(
        "proteome_id", F.col("n").alias("n_proteins")
    )
    structs = supports["sup_p_pdb"].groupBy("proteome_id").agg(
        F.count(F.lit(1)).alias("n_structures")
    )
    accs = supports["sup_p_sig"].groupBy("proteome_id", "database").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("signature_acc", F.col("n").alias("n_matches"))
                    )
                ),
                lambda s: F.concat_ws("=", s["signature_acc"], s["n_matches"]),
            ),
            ",",
        ).alias("accs")
    )
    n_prot_db = supports["sup_p_db"].select(
        "proteome_id", "database", F.col("n").alias("n_prot_db")
    )
    db_json = (
        accs.join(n_prot_db, ["proteome_id", "database"])
        .groupBy("proteome_id")
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
    return (
        prot.join(structs, "proteome_id", "left")
        .join(db_json, "proteome_id", "left")
        .select(
            "proteome_id",
            "n_proteins",
            F.coalesce("n_structures", F.lit(0)).alias("n_structures"),
            F.coalesce("db_json", F.lit("")).alias("db_json"),
        )
    )


# ---------------------------------------------------------- structure

STRUCT_SUPPORT_NAMES = (
    "sup_s_dbsig", "sup_s_clan", "sup_s_prot", "sup_s_tax",
    "sup_s_proteome", "sup_s_dom", "sup_s_np",
)

STRUCT_SUPPORT_KEYS: dict[str, list[str]] = {
    "sup_s_dbsig": ["pdb_id", "database", "signature_acc"],
    "sup_s_clan": ["pdb_id", "clan_acc"],
    "sup_s_prot": ["pdb_id", "protein_acc"],
    "sup_s_tax": ["pdb_id", "tax_id"],
    "sup_s_proteome": ["pdb_id", "proteome_id"],
    "sup_s_dom": ["pdb_id", "dom_id"],
    "sup_s_np": ["pdb_id"],
}

STRUCT_BUCKETED_SUPPORTS: dict[str, str] = {"sup_s_prot": "protein_acc"}
STRUCT_LEVEL2_ROLLUPS: dict[str, Rollup] = {
    "sup_s_prot": Rollup("sup_s_np", ("pdb_id",)),
}

STRUCT_PYRAMID = MartPyramid(
    name="structure",
    support_keys=STRUCT_SUPPORT_KEYS,
    bucketed=STRUCT_BUCKETED_SUPPORTS,
    rollups=STRUCT_LEVEL2_ROLLUPS,
)


def seed_structure_supports(
    pdb_matches: DataFrame,        # pdb_id, signature_acc, database
    signature_clans: DataFrame,    # signature_acc, clan_acc
    protein_structures: DataFrame, # protein_acc, pdb_id (distinct pairs)
    proteins: DataFrame,           # protein_acc, tax_id
    protein_proteomes: DataFrame,
    protein_domorgs: DataFrame,    # protein_acc, dom_id (distinct)
) -> dict[str, DataFrame]:
    """Full aggregation of the structure-mart supports from a base
    release (reference export-structure2xrefs, cli.py:402). Two
    independent fact families: the pdb-match side (sup_s_dbsig /
    sup_s_clan) and the protein-link side (the rest); no bilinear
    coupling because they never join each other in the mart."""
    ps = owned_persist(protein_structures.select("pdb_id", "protein_acc"))
    sup = {
        "sup_s_dbsig": _count(pdb_matches, STRUCT_SUPPORT_KEYS["sup_s_dbsig"]),
        "sup_s_clan": _count(
            pdb_matches.join(F.broadcast(signature_clans), "signature_acc"),
            STRUCT_SUPPORT_KEYS["sup_s_clan"],
        ),
        "sup_s_prot": _count(ps, STRUCT_SUPPORT_KEYS["sup_s_prot"]),
        "sup_s_tax": _count(
            ps.join(proteins, "protein_acc"),
            STRUCT_SUPPORT_KEYS["sup_s_tax"],
        ),
        "sup_s_proteome": _count(
            ps.join(protein_proteomes, "protein_acc"),
            STRUCT_SUPPORT_KEYS["sup_s_proteome"],
        ),
        "sup_s_dom": _count(
            ps.join(protein_domorgs, "protein_acc"),
            STRUCT_SUPPORT_KEYS["sup_s_dom"],
        ),
    }
    return seed_level2(sup, STRUCT_PYRAMID)


def _signed_pm_delta(delta_pm: DataFrame) -> DataFrame:
    """pdb-match changelog (keyed pm_id) -> signed (pdb_id,
    signature_acc, database, s) rows."""
    retract = delta_pm.filter(
        F.col("change_type").isin("delete", "update")
    ).select(
        F.col("old_pdb_id").alias("pdb_id"),
        F.col("old_signature_acc").alias("signature_acc"),
        F.col("old_database").alias("database"),
        F.lit(-1).cast("long").alias("s"),
    )
    add = delta_pm.filter(F.col("change_type").isin("insert", "update")).select(
        F.col("new_pdb_id").alias("pdb_id"),
        F.col("new_signature_acc").alias("signature_acc"),
        F.col("new_database").alias("database"),
        F.lit(1).cast("long").alias("s"),
    )
    return retract.unionByName(add)


def _signed_ps_delta(delta_ps: DataFrame) -> DataFrame:
    """protein->structure link changelog (keyed by the composite
    (protein_acc, pdb_id) itself, so only inserts/deletes occur) ->
    signed (protein_acc, pdb_id, s) rows."""
    retract = delta_ps.filter(F.col("change_type") == "delete").select(
        "protein_acc", "pdb_id", F.lit(-1).cast("long").alias("s")
    )
    add = delta_ps.filter(F.col("change_type") == "insert").select(
        "protein_acc", "pdb_id", F.lit(1).cast("long").alias("s")
    )
    return retract.unionByName(add)


def structure_support_deltas(
    delta_pm: DataFrame,
    delta_ps: DataFrame,
    signature_clans: DataFrame,
    proteins: DataFrame,
    protein_proteomes: DataFrame,
    protein_domorgs: DataFrame,
) -> dict[str, DataFrame]:
    """The signed support deltas of one structure-mart epoch: the
    pdb-match delta feeds the entry/clan supports, the protein-link
    delta (joined once against each static protein dim) feeds the
    protein-side supports. ``dpm``/``dps`` persist (multiple
    consumers); released by the consumer's engine_cache_scope."""
    dpm = owned_persist(_signed_pm_delta(delta_pm))
    dps = owned_persist(_signed_ps_delta(delta_ps))
    return {
        "sup_s_dbsig": dpm,
        "sup_s_clan": dpm.join(
            F.broadcast(signature_clans), "signature_acc"
        ).select("pdb_id", "clan_acc", "s"),
        "sup_s_prot": dps.select("pdb_id", "protein_acc", "s"),
        "sup_s_tax": dps.join(proteins, "protein_acc").select(
            "pdb_id", "tax_id", "s"
        ),
        "sup_s_proteome": dps.join(protein_proteomes, "protein_acc").select(
            "pdb_id", "proteome_id", "s"
        ),
        "sup_s_dom": dps.join(protein_domorgs, "protein_acc").select(
            "pdb_id", "dom_id", "s"
        ),
    }


def maintain_structure_supports(
    supports: dict[str, DataFrame],
    delta_pm: DataFrame,
    delta_ps: DataFrame,
    signature_clans: DataFrame,
    proteins: DataFrame,
    protein_proteomes: DataFrame,
    protein_domorgs: DataFrame,
) -> dict[str, DataFrame]:
    """One structure-mart IVM epoch: :func:`structure_support_deltas`
    composed with the shared pyramid merge — the facts-scale
    sup_s_prot merges pruned and maintains the level-2 per-pdb
    distinct-protein count from its transitions."""
    deltas = structure_support_deltas(
        delta_pm, delta_ps, signature_clans, proteins,
        protein_proteomes, protein_domorgs,
    )
    return _merge_supports(supports, deltas, STRUCT_PYRAMID)


def structure_mart_from_supports(supports: dict[str, DataFrame]) -> DataFrame:
    """Render the maintained structure supports into
    :func:`..domain.marts.structure_xrefs_mart`'s exact output —
    entries_json re-nested canonically, n_proteins from the level-2
    ``sup_s_np``; no facts-scale relation in the render plan."""
    entries = (
        supports["sup_s_dbsig"]
        .groupBy("pdb_id", "database")
        .agg(F.count(F.lit(1)).alias("n_accs"))
        .groupBy("pdb_id")
        .agg(
            F.sum("n_accs").cast("long").alias("n_entries"),
            _sorted_join(
                F.collect_list(
                    F.concat_ws("", F.col("database"), F.lit(":"), F.col("n_accs"))
                )
            ).alias("entries_json"),
        )
    )
    n_sets = supports["sup_s_clan"].groupBy("pdb_id").agg(
        F.count(F.lit(1)).alias("n_sets")
    )
    np_ = supports["sup_s_np"].select("pdb_id", F.col("n").alias("n_proteins"))
    n_taxa = supports["sup_s_tax"].groupBy("pdb_id").agg(
        F.count(F.lit(1)).alias("n_taxa")
    )
    n_proteomes = supports["sup_s_proteome"].groupBy("pdb_id").agg(
        F.count(F.lit(1)).alias("n_proteomes")
    )
    n_dom = supports["sup_s_dom"].groupBy("pdb_id").agg(
        F.count(F.lit(1)).alias("n_dom_orgs")
    )
    return (
        entries.join(n_sets, "pdb_id", "left")
        .join(np_, "pdb_id", "left")
        .join(n_taxa, "pdb_id", "left")
        .join(n_proteomes, "pdb_id", "left")
        .join(n_dom, "pdb_id", "left")
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
