"""PDBe/SIFTS pipeline tests (domain/pdbe.py vs reference
pdbe.py:26-96, oracle/structures.py:196-216, xrefs/utils.py:22-54)."""

from __future__ import annotations

from interpro7_dw_spark.domain.pdbe import (
    entry_structure_coverage,
    map_fragments_to_auth,
    sifts_segments,
    structure_protein_segments,
)


def test_sifts_segments_swap_dedup_and_nesting(spark):
    raw = spark.createDataFrame(
        [
            # inverted protein coords -> swapped back
            ("P1", "1abc", "A", 50, 10, 17, 57, 117, 157),
            # duplicate raw row -> DISTINCT keeps one
            ("P1", "1abc", "A", 10, 50, 17, 57, 117, 157),
            ("P1", "1abc", "A", 60, 80, 67, 87, None, None),
            ("P2", "1abc", "B", 5, 9, 12, 16, 112, 116),
        ],
        "protein_acc string, pdb_id string, chain string, protein_start long, "
        "protein_end long, structure_start long, structure_end long, "
        "auth_start long, auth_end long",
    )
    seg = sifts_segments(raw)
    assert seg.count() == 3  # dedup collapsed the swapped duplicate
    nested = {
        (r.pdb_id, r.protein_acc, r.chain): r
        for r in structure_protein_segments(seg).collect()
    }
    r = nested[("1abc", "P1", "A")]
    # sorted by (protein_start, protein_end); nulls rendered literally
    assert r.segments_str == "10-50:17-57:117-157,60-80:67-87:null-null"
    assert r.n_segments == 2


def test_map_fragments_to_auth_both_or_neither(spark):
    frags = spark.createDataFrame(
        [
            ("1abc_A", "SIG1", 10, 20),   # both mapped
            ("1abc_A", "SIG1", 10, 99),   # end key missing
            ("1abc_A", "SIG2", 10, 30),   # end value null
        ],
        "pdb_chain string, signature_acc string, frag_start long, frag_end long",
    )
    rmap = spark.createDataFrame(
        [("1abc_A", 10, 110), ("1abc_A", 20, 120), ("1abc_A", 30, None)],
        "pdb_chain string, seq_pos long, auth_pos long",
    )
    got = {
        (r.signature_acc, r.frag_end): (r.auth_start, r.auth_end)
        for r in map_fragments_to_auth(frags, rmap).collect()
    }
    assert got[("SIG1", 20)] == (110, 120)
    assert got[("SIG1", 99)] == (None, None)   # missing key -> both None
    assert got[("SIG2", 30)] == (None, None)   # null value -> both None


def test_entry_structure_coverage_union_and_rollup(spark):
    frags = spark.createDataFrame(
        [
            # overlapping fragments on chain A: union [1,15] = 15
            ("1abc_A", "SIG1", 1, 10),
            ("1abc_A", "SIG1", 5, 15),
            # chain B of the same pdb: 5 residues
            ("1abc_B", "SIG1", 3, 7),
            ("2def_A", "SIG1", 1, 4),
        ],
        "pdb_chain string, signature_acc string, frag_start long, frag_end long",
    )
    lens = spark.createDataFrame(
        [("1abc_A", 100), ("1abc_B", 50), ("2def_A", 80)],
        "pdb_chain string, length long",
    )
    got = {
        (r.signature_acc, r.pdb_id): (r.total_length, r.covered)
        for r in entry_structure_coverage(frags, lens).collect()
    }
    # 1abc: lengths 100+50, covered 15+5 (per-chain interval union)
    assert got[("SIG1", "1abc")] == (150, 20)
    assert got[("SIG1", "2def")] == (80, 4)
