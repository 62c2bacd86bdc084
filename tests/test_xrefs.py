"""Golden tests for the xrefs layer (sim-entries graph, EC coverage
filter) and the forward as-of join (release-freeze attribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from interpro7_dw_spark.domain.xrefs import filter_ec_numbers, sim_entries
from interpro7_dw_spark.operators.joins import as_of_join


def test_as_of_join_forward_release_attribution(spark):
    audits = spark.createDataFrame(
        [("E1", 5), ("E1", 12), ("E1", 20), ("E1", 35)], "acc string, ts long"
    ).withColumn("g", F.lit(1))
    freezes = spark.createDataFrame(
        [("91.0", 10), ("92.0", 20), ("93.0", 30)], "version string, frozen_at long"
    ).withColumn("g", F.lit(1))
    out = as_of_join(
        audits, freezes, ["g"], "ts", "frozen_at", ["version"],
        tiebreak="version", direction="forward",
    )
    got = {r["ts"]: r["version_asof"] for r in out.collect()}
    # first freeze >= ts; ts=20 hits the freeze exactly; ts=35 is after
    # the last freeze -> null (the reference drops those edits)
    assert got == {5: "91.0", 12: "92.0", 20: "92.0", 35: None}


def _entry_locs(spark, rows):
    return spark.createDataFrame(
        rows,
        "protein_acc string, entry_acc string, entry_type string, "
        "locations array<struct<start: bigint, end: bigint>>",
    )


def test_sim_entries_supfam_pair_detected(spark):
    # E2 (supfam) fully contains E1 (domain) on every shared protein
    rows = []
    for p in ("P1", "P2", "P3", "P4"):
        rows.append((p, "IPR001", "domain", [(10, 100)]))
        rows.append((p, "IPR002", "homologous_superfamily", [(5, 120)]))
    out = sim_entries(_entry_locs(spark, rows)).collect()
    assert {(r["entry_acc"], r["other_acc"]) for r in out} == {("IPR002", "IPR001")}


def test_sim_entries_type_rule_blocks_domain_domain(spark):
    rows = []
    for p in ("P1", "P2", "P3"):
        rows.append((p, "IPR001", "domain", [(10, 100)]))
        rows.append((p, "IPR002", "domain", [(5, 120)]))
    assert sim_entries(_entry_locs(spark, rows)).count() == 0


def test_sim_entries_low_overlap_excluded(spark):
    # locations overlap by < 50% of both sides on every protein, and
    # one lone protein breaks containment
    rows = []
    for p in ("P1", "P2", "P3"):
        rows.append((p, "IPR001", "domain", [(1, 100)]))
        rows.append((p, "IPR002", "homologous_superfamily", [(95, 200)]))
    out = sim_entries(_entry_locs(spark, rows)).count()
    assert out == 0


def test_filter_ec_numbers_pass_and_stem_fallback(spark):
    rows = []
    # entry E with 10 proteins; EC 1.1.1.1 on 7 (70%, >=3) -> passes
    for i in range(7):
        rows.append(("E", "1.1.1.1", f"P{i}"))
    # EC 2.2.2.1 on 4 and 2.2.2.2 on 4 (40% each: count ok, coverage
    # fails) -> stem 2.2.2 union = 8 proteins (80%) -> stem passes
    for i in range(4):
        rows.append(("E", "2.2.2.1", f"P{i}"))
    for i in range(4, 8):
        rows.append(("E", "2.2.2.2", f"P{i}"))
    # EC 3.3.3.1 on 2 proteins (< min count) -> ignored entirely
    rows += [("E", "3.3.3.1", "P0"), ("E", "3.3.3.1", "P1")]
    ec = spark.createDataFrame(rows, "entry_acc string, ec string, protein_acc string")
    totals = spark.createDataFrame([("E", 10)], "entry_acc string, n_proteins long")
    got = {(r["entry_acc"], r["term"]) for r in filter_ec_numbers(ec, totals).collect()}
    assert got == {("E", "1.1.1.1"), ("E", "2.2.2")}


def test_filter_ec_stem_needs_two_failing_members(spark):
    # a single failing EC does not create a stem candidate
    rows = [("E", "4.4.4.1", f"P{i}") for i in range(4)]
    ec = spark.createDataFrame(rows, "entry_acc string, ec string, protein_acc string")
    totals = spark.createDataFrame([("E", 10)], "entry_acc string, n_proteins long")
    assert filter_ec_numbers(ec, totals).count() == 0


def test_entry_xrefs_mart(spark):
    from interpro7_dw_spark.domain.marts import entry_xrefs_mart

    pe = spark.createDataFrame(
        [("P1", "E1"), ("P2", "E1"), ("P3", "E1"), ("P1", "E2")],
        "protein_acc string, entry_acc string",
    )
    pt = spark.createDataFrame(
        [("P1", "9606"), ("P2", "9606"), ("P3", "10090")],
        "protein_acc string, tax_id string",
    )
    pp = spark.createDataFrame([("P1", "UP1")], "protein_acc string, proteome_id string")
    ps = spark.createDataFrame([("P9", "1abc")], "protein_acc string, pdb_id string")

    rows = {r["entry_acc"]: r for r in entry_xrefs_mart(pe, pt, pp, ps).collect()}
    e1 = rows["E1"]
    assert (e1["n_proteins"], e1["n_taxa"], e1["n_proteomes"], e1["n_structures"]) == (3, 2, 1, 0)
    import json
    assert json.loads(e1["taxa_json"]) == {"9606": 2, "10090": 1}
    e2 = rows["E2"]
    assert (e2["n_proteins"], e2["n_structures"]) == (1, 0)
    # empty map -> NULL per the jsonify rule would apply if no taxa; E2 has one
    assert json.loads(e2["taxa_json"]) == {"9606": 1}


def test_sequence_database_stats_antifam_rule(spark):
    from interpro7_dw_spark.domain.stats import sequence_database_stats

    proteins = spark.createDataFrame(
        [("P1", True), ("P2", True), ("P3", False), ("P4", False), ("P5", False)],
        "protein_acc string, reviewed boolean",
    )
    matches = spark.createDataFrame(
        [
            ("P1", "pfam", None), ("P1", "interpro", "IPR1"),  # reviewed, integrated
            ("P2", "antifam", None),                           # AntiFam-only: not a hit
            ("P3", "cdd", None),                               # hit, not integrated
            # P4: no matches at all; P5: no matches
        ],
        "protein_acc string, match_db string, entry_acc string",
    )
    got = {r["database"]: (r["count"], r["hit"], r["integrated"])
           for r in sequence_database_stats(proteins, matches).collect()}
    assert got == {
        "reviewed": (2, 1, 1),
        "unreviewed": (3, 1, 0),
        "uniprot": (5, 2, 1),
    }


def _mart_fixture(spark):
    proteins = spark.createDataFrame(
        [("P1", "T1"), ("P2", "T1"), ("P3", "T2")],
        "protein_acc string, tax_id string",
    )
    # T1 and T2 are siblings under ROOT; lineage includes self
    ancestors = spark.createDataFrame(
        [("T1", "T1"), ("T1", "ROOT"), ("T2", "T2"), ("T2", "ROOT")],
        "tax_id string, ancestor string",
    )
    matches = spark.createDataFrame(
        [
            ("P1", "S1", "pfam"),
            ("P1", "S1", "pfam"),   # second match row: entries count += 1, protein once
            ("P1", "S2", "cdd"),
            ("P2", "S1", "pfam"),
            ("P3", "S3", "pfam"),
        ],
        "protein_acc string, signature_acc string, database string",
    )
    proteomes = spark.createDataFrame(
        [("P1", "UP1"), ("P3", "UP2")], "protein_acc string, proteome_id string"
    )
    structures = spark.createDataFrame(
        [("P1", "1abc"), ("P2", "1abc"), ("P3", "2xyz")],
        "protein_acc string, pdb_id string",
    )
    return proteins, ancestors, matches, proteomes, structures


def test_taxon_mart_lineage_propagation_and_db_nesting(spark):
    from interpro7_dw_spark.domain.marts import taxon_xrefs_mart

    proteins, ancestors, matches, proteomes, structures = _mart_fixture(spark)
    rows = {
        r["tax_id"]: r
        for r in taxon_xrefs_mart(
            proteins, matches, proteomes, structures, ancestors
        ).collect()
    }
    # ROOT aggregates both taxa: 3 proteins, 2 proteomes, 2 structures
    assert (rows["ROOT"]["n_proteins"], rows["ROOT"]["n_proteomes"],
            rows["ROOT"]["n_structures"]) == (3, 2, 2)
    # per-db nesting at T1: pfam counted P1 once despite 2 match rows;
    # entries carry match-row counts (reference taxa.py:65-73)
    assert rows["T1"]["db_json"] == "cdd:1[S2=1];pfam:2[S1=3]"
    assert rows["ROOT"]["db_json"] == "cdd:1[S2=1];pfam:3[S1=3,S3=1]"
    assert rows["T2"]["db_json"] == "pfam:1[S3=1]"


def test_clan_mart_counts_match_rows_and_set_union_structures(spark):
    from interpro7_dw_spark.domain.marts import clan_xrefs_mart

    proteins, _, matches, proteomes, _ = _mart_fixture(spark)
    sig_clans = spark.createDataFrame(
        [("S1", "CL1"), ("S3", "CL1")], "signature_acc string, clan_acc string"
    )
    domorg_members = spark.createDataFrame(
        [("P1", "S1", "D1"), ("P3", "S3", "D2")],
        "protein_acc string, signature_acc string, dom_id string",
    )
    entry_structures = spark.createDataFrame(
        [("S1", "1abc"), ("S1", "9zzz"), ("S3", "1abc")],
        "signature_acc string, pdb_id string",
    )
    rows = {
        r["clan_acc"]: r
        for r in clan_xrefs_mart(
            matches, sig_clans, proteins, proteomes, domorg_members, entry_structures
        ).collect()
    }
    cl = rows["CL1"]
    # S2/cdd not in the clan: excluded. 4 match rows (P1 S1 twice, P2 S1, P3 S3)
    assert cl["n_protein_matches"] == 4          # reference appends per match row
    assert cl["n_entries"] == 2                  # S1, S3
    assert cl["n_proteins"] == 3
    assert cl["n_taxa"] == 2
    assert cl["n_dom_orgs"] == 2                 # membership on (protein, signature)
    assert cl["n_structures"] == 2               # union{1abc,9zzz,1abc} pop-once semantics


def test_structure_mart_rollups(spark):
    from interpro7_dw_spark.domain.marts import structure_xrefs_mart

    proteins, _, _, proteomes, structures = _mart_fixture(spark)
    pdb_matches = spark.createDataFrame(
        [("1abc", "S1", "pfam"), ("1abc", "S2", "cdd"), ("2xyz", "S3", "pfam")],
        "pdb_id string, signature_acc string, database string",
    )
    sig_clans = spark.createDataFrame(
        [("S1", "CL1"), ("S3", "CL1")], "signature_acc string, clan_acc string"
    )
    domorgs = spark.createDataFrame(
        [("P1", "D1"), ("P2", "D1")], "protein_acc string, dom_id string"
    )
    rows = {
        r["pdb_id"]: r
        for r in structure_xrefs_mart(
            pdb_matches, sig_clans, structures, proteins, proteomes, domorgs
        ).collect()
    }
    one = rows["1abc"]
    assert one["n_entries"] == 2 and one["entries_json"] == "cdd:1;pfam:1"
    assert one["n_sets"] == 1
    # P1 and P2 map to 1abc: 2 proteins, 1 taxon (both T1), 1 proteome, 1 domorg
    assert (one["n_proteins"], one["n_taxa"], one["n_proteomes"], one["n_dom_orgs"]) == (2, 1, 1, 1)
    two = rows["2xyz"]
    assert (two["n_proteins"], two["n_taxa"], two["n_proteomes"]) == (1, 1, 1)
    assert two["n_dom_orgs"] == 0


def test_proteome_mart(spark):
    from interpro7_dw_spark.domain.marts import proteome_xrefs_mart

    _, _, matches, proteomes, structures = _mart_fixture(spark)
    rows = {
        r["proteome_id"]: r
        for r in proteome_xrefs_mart(proteomes, matches, structures).collect()
    }
    assert rows["UP1"]["n_proteins"] == 1 and rows["UP1"]["n_structures"] == 1
    assert rows["UP1"]["db_json"] == "cdd:1[S2=1];pfam:1[S1=2]"
    assert rows["UP2"]["db_json"] == "pfam:1[S3=1]"
