"""Goldens for the search-document fan-out (reference
interpro/elastic/export.py:576-701 cross product + 129-284 leftovers)."""

from __future__ import annotations

from interpro7_dw_spark.domain.documents import relationship_documents


def test_relationship_documents_fanout_and_leftovers(spark):
    proteins = spark.createDataFrame(
        [("P1", "9606"), ("P2", "9606"), ("P3", "10090")],
        "protein_acc string, tax_id string",
    )
    protein_entries = spark.createDataFrame(
        [("P1", "IPR1"), ("P1", "IPR2"), ("P2", "IPR1")],
        "protein_acc string, entry_acc string",
    )
    protein_chains = spark.createDataFrame(
        [("P1", "1abc_A"), ("P1", "1abc_B")], "protein_acc string, pdb_chain string"
    )
    entries = spark.createDataFrame(
        [("IPR1",), ("IPR2",), ("IPR_ORPHAN",)], "entry_acc string"
    )
    structures = spark.createDataFrame(
        [("1abc_A",), ("1abc_B",), ("9zzz_X",)], "pdb_chain string"
    )
    taxa = spark.createDataFrame([("9606",), ("10090",), ("559292",)], "tax_id string")

    docs = relationship_documents(
        proteins, protein_entries, protein_chains, entries, structures, taxa
    ).collect()
    rel = {(r["protein_acc"], r["entry_acc"], r["pdb_chain"]) for r in docs if r["doc_type"] == "relationship"}

    # P1: 2 entries x 2 chains = 4 docs
    assert {("P1", e, c) for e in ("IPR1", "IPR2") for c in ("1abc_A", "1abc_B")} <= rel
    # P2: entry but no chain -> (entry, null)
    assert ("P2", "IPR1", None) in rel
    # P3: neither -> protein-only doc
    assert ("P3", None, None) in rel
    assert len(rel) == 6

    # leftovers: unseen entry / structure / taxon become fallback docs
    leftovers = {(r["doc_type"], r["entry_acc"], r["pdb_chain"], r["tax_id"])
                 for r in docs if r["doc_type"] != "relationship"}
    assert leftovers == {
        ("entry", "IPR_ORPHAN", None, None),
        ("structure", None, "9zzz_X", None),
        ("taxon", None, None, "559292"),
    }

    # doc ids deterministic and unique
    ids = [r["doc_id"] for r in docs]
    assert len(ids) == len(set(ids))


def test_ida_documents_dedup_and_representative(spark):
    from interpro7_dw_spark.domain.documents import ida_documents

    loc = "array<struct<start long, `end` long, pfam string, interpro string>>"
    domorgs = spark.createDataFrame(
        [
            # same ida held by three proteins; P2 is oldest -> rep
            ("P1", "ID1", "PF1:IPR1-PF2", "2020-05-05", 100,
             [(10, 20, "PF1", "IPR1"), (30, 40, "PF2", None)]),
            ("P2", "ID1", "PF1:IPR1-PF2", "2019-01-01", 90,
             [(5, 15, "PF1", "IPR1"), (25, 35, "PF2", None)]),
            ("P3", "ID1", "PF1:IPR1-PF2", "2019-01-01", 95,   # date tie: P2 < P3
             [(6, 16, "PF1", "IPR1"), (26, 36, "PF2", None)]),
            ("P4", "ID2", "PF9", "2021-01-01", 50, [(1, 9, "PF9", None)]),
        ],
        f"protein_acc string, dom_id string, dom_key string, date string, "
        f"length long, locations {loc}",
    )
    names = spark.createDataFrame(
        [("PF1", "kinase"), ("IPR1", "kin_entry"), ("PF2", None)],
        "entry_acc string, short_name string",
    )
    got = {r.ida_id: r for r in ida_documents(domorgs, names).collect()}
    assert set(got) == {"ID1", "ID2"}
    r = got["ID1"]
    # oldest member wins, accession tiebreak (domorgs.py:66-90)
    assert (r.rep_protein, r.rep_length, r.n_proteins) == ("P2", 90, 3)
    # pfam element then interpro element per location; null name -> ''
    assert r.domains_str == "PF1=kinase:5-15,IPR1=kin_entry:5-15,PF2=:25-35"
    # PF9 has no dim row at all -> '' name
    assert got["ID2"].domains_str == "PF9=:1-9"
