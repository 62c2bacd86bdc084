"""Golden tests for the taxonomy main-rank lineage and the per-entry
distribution tree (reference interpro/xrefs/entries.py:349-368,405-466)."""

from __future__ import annotations

import json

from interpro7_dw_spark.domain.taxonomy import main_rank_lineage, taxon_distribution_tree


def _taxa(spark):
    # root(1, no rank) -> 2 domain -> 3 phylum -> 4 order -> 5 genus -> 6 species
    # (kingdom, class, family missing: gaps in main ranks)
    rows = [
        ("1", None, "no rank", "root node"),
        ("2", "1", "domain", "Bacteria"),
        ("3", "2", "phylum", "Proteobacteria"),
        ("4", "3", "order", "Enterobacterales"),
        ("5", "4", "genus", "Escherichia"),
        ("6", "5", "species", "E. coli"),
        ("7", "5", "species", "E. fergusonii"),
    ]
    return spark.createDataFrame(
        rows, "tax_id string, parent_id string, rank string, sci_name string"
    )


def test_main_rank_lineage_with_gaps(spark):
    got = {r["tax_id"]: r["main_ranks"] for r in main_rank_lineage(_taxa(spark)).collect()}
    # ranks: [domain, kingdom, phylum, class, order, family, genus, species]
    assert got["6"] == ["2", None, "3", None, "4", None, "5", "6"]
    assert got["4"] == ["2", None, "3", None, "4", None, None, None]
    assert got["1"] == [None] * 8


def test_taxon_distribution_tree(spark):
    facts = spark.createDataFrame(
        [("IPR1", "6", 10, True), ("IPR1", "7", 5, True), ("IPR1", "4", 2, False)],
        "entry_acc string, tax_id string, num_proteins long, is_species boolean",
    )
    out = taxon_distribution_tree(facts, _taxa(spark)).collect()
    assert len(out) == 1
    tree = json.loads(out[0]["tree"])
    # root wrapper totals
    assert tree["name"] == "root" and tree["proteins"] == 17 and tree["species"] == 2
    # level 0: single domain node (Bacteria) carrying everything
    assert len(tree["children"]) == 1
    dom = tree["children"][0]
    assert dom["id"] == "2" and dom["rank"] == "domain" and dom["name"] == "Bacteria"
    assert dom["proteins"] == 17 and dom["species"] == 2
    # kingdom gap -> synthetic id "2-1" with null name
    kingdom = dom["children"][0]
    assert kingdom["id"] == "2-1" and kingdom["rank"] == "kingdom" and kingdom["name"] is None
    # walk down to genus: species fan out under it
    phylum = kingdom["children"][0]
    assert phylum["id"] == "3"
    cls = phylum["children"][0]
    order = cls["children"][0]
    assert order["id"] == "4" and order["proteins"] == 17
    family_gap = order["children"][0]
    assert family_gap["id"] == "4-5"
    # under the family gap: the real genus "5" (taxa 6+7) AND taxon 4's
    # synthetic continuation "4-5-6" (its counts descend through gaps,
    # reference entries.py:413-421 — unique_id keeps accumulating)
    kids = {c["id"]: c for c in family_gap["children"]}
    assert set(kids) == {"4-5-6", "5"}
    genus = kids["5"]
    assert genus["proteins"] == 15 and genus["species"] == 2
    assert kids["4-5-6"]["proteins"] == 2 and kids["4-5-6"]["species"] == 0
    species_ids = sorted(s["id"] for s in genus["children"])
    assert species_ids == ["6", "7"]
