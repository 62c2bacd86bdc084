"""webfront_taxonomy mart family (domain/taxonomy_mart.py vs
reference interpro/mysql/taxa.py:11-198): lineage framing, children
JSON nullability, subtree rollups, and the two-source structure
merge."""

from __future__ import annotations

import json

import pytest

from interpro7_dw_spark.domain.taxonomy_mart import taxonomy_marts


@pytest.fixture(scope="module")
def marts(spark):
    taxa = spark.createDataFrame(
        [
            ("ROOT", None, "no rank", "Sci ROOT", "Full ROOT"),
            ("R1", "ROOT", "superkingdom", "Sci R1", "Full R1"),
            ("N1", "R1", "species", "Sci N1", "Full N1"),
            ("N2", "R1", "species", "Sci N2", "Full N2"),  # no proteins
        ],
        "tax_id string, parent_id string, rank string, sci_name string, full_name string",
    )
    protein_base = spark.createDataFrame(
        [("P1", "N1", "UP1"), ("P2", "N1", None)],
        "protein_acc string, tax_id string, proteome_id string",
    )
    protein_matches = spark.createDataFrame(
        [("P1", "pfam", "PF1"), ("P1", "pfam", "PF2"), ("P2", "pfam", "PF1"),
         ("P2", "cdd", "CD1")],
        "protein_acc string, db string, entry_acc string",
    )
    protein_structures = spark.createDataFrame(
        [("P1", "1abc")], "protein_acc string, pdb_id string"
    )
    # structure-side: an entry (SM9) with NO protein matches at all,
    # plus extra structures for PF1
    entry_pdb = spark.createDataFrame(
        [("N1", "smart", "SM9", "9xyz"), ("N1", "pfam", "PF1", "2def")],
        "tax_id string, db string, entry_acc string, pdb_id string",
    )
    per_taxon, per_entry, per_db = taxonomy_marts(
        taxa, protein_base, protein_matches, protein_structures, entry_pdb
    )
    return (
        {r.tax_id: r for r in per_taxon.collect()},
        {(r.tax_id, r.entry_acc): r for r in per_entry.collect()},
        {(r.tax_id, r.source_database): r for r in per_db.collect()},
    )


def test_per_taxon_rows(marts):
    per_taxon, _, _ = marts
    # protein-bearing subtrees only: N2 has no proteins -> no row
    assert set(per_taxon) == {"ROOT", "R1", "N1"}
    n1 = per_taxon["N1"]
    assert n1.lineage_str == " ROOT R1 N1 "
    assert (n1.parent_id, n1.rank, n1.sci_name) == ("R1", "species", "Sci N1")
    assert n1.children_json is None          # leaf -> jsonify(empty) NULL
    assert per_taxon["R1"].children_json == '["N1","N2"]'  # incl. proteinless child
    assert n1.num_proteins == 2
    # counts: entries merged from both sources (PF1, PF2, CD1, SM9);
    # structures = protein-side {1abc} UNION entry-side {9xyz, 2def}
    assert json.loads(n1.counts) == {
        "entries": {"total": 4, "cdd": 1, "pfam": 2, "smart": 1},
        "proteomes": 1, "proteins": 2, "structures": 3,
    }
    # rollup reaches the root unchanged (single lineage here)
    assert json.loads(per_taxon["ROOT"].counts)["proteins"] == 2


def test_per_entry_rows(marts):
    _, per_entry, _ = marts
    # PF1: two proteins, one entry-side structure
    assert json.loads(per_entry[("N1", "PF1")].counts) == {
        "proteomes": 1, "proteins": 2, "structures": 1,
    }
    # structure-only entry: zero proteins but present (taxa.py:118-126)
    sm9 = per_entry[("N1", "SM9")]
    assert sm9.num_proteins == 0
    assert json.loads(sm9.counts)["structures"] == 1
    # protein-only entry: zero structures
    assert json.loads(per_entry[("R1", "PF2")].counts)["structures"] == 0


def test_per_db_rows(marts):
    _, _, per_db = marts
    pfam = per_db[("N1", "pfam")]
    # both proteins matched pfam -> counted once each
    assert pfam.num_proteins == 2
    assert json.loads(pfam.counts) == {
        "entries": 2, "proteomes": 1, "proteins": 2, "structures": 1,
    }
    smart = per_db[("N1", "smart")]
    assert smart.num_proteins == 0
    assert json.loads(smart.counts) == {
        "entries": 1, "proteomes": 1, "proteins": 0, "structures": 1,
    }
