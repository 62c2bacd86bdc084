"""Golden TSV tests for the GOA exports (domain/goa.py vs reference
uniprot/goa.py:84-258)."""

from __future__ import annotations

import glob

from interpro7_dw_spark.domain.goa import (
    IPR2GO_HEADER,
    PDB2GO_HEADER,
    PTHR2GO_HEADER,
    ipr2go2uniprot,
    pdb2interpro2go,
    pthr2go2uniprot,
)
from interpro7_dw_spark.sources.sinks import write_tsv


def _read_single(path):
    parts = glob.glob(path + "/part-*.txt")
    assert len(parts) == 1
    return open(parts[0]).read().splitlines()


def test_ipr2go2uniprot(spark, tmp_path):
    go = spark.createDataFrame(
        [("IPR1", "GO:1"), ("IPR1", "GO:2"), ("IPR2", "GO:3")],
        "entry_acc string, go_id string",
    )
    prots = spark.createDataFrame(
        [("IPR1", "P1"), ("IPR1", "P2")], "entry_acc string, uniprot_acc string"
    )
    df = ipr2go2uniprot(go, prots)
    out = str(tmp_path / "ipr2go")
    write_tsv(
        df.orderBy("entry_acc", "go_id", "uniprot_acc"),
        out,
        header_lines=[IPR2GO_HEADER],
        include_header=False,
    )
    assert _read_single(out) == [
        "#InterPro accession\tGO ID\tUniProt accession",
        "IPR1\tGO:1\tP1",
        "IPR1\tGO:1\tP2",
        "IPR1\tGO:2\tP1",
        "IPR1\tGO:2\tP2",
    ]  # IPR2 has no proteins -> no rows (inner join, goa.py:156-158)


def test_pdb2interpro2go(spark, tmp_path):
    matches = spark.createDataFrame(
        [("1abc", "A", "IPR1"), ("1abc", "B", "IPR1"), ("2xyz", "A", "IPR2")],
        "pdb_id string, chain string, entry_acc string",
    )
    taxa = spark.createDataFrame(
        # 2xyz/A has no taxon -> dropped
        [("1abc", "A", "9606"), ("1abc", "B", "10090")],
        "pdb_id string, chain string, taxon_id string",
    )
    go = spark.createDataFrame([("IPR1", "GO:1")], "entry_acc string, go_id string")
    prots = spark.createDataFrame(
        # chain B maps to no protein -> empty field
        [("1abc", "A", "P1")], "pdb_id string, chain string, uniprot_acc string"
    )
    rows = {
        tuple(r)
        for r in pdb2interpro2go(matches, taxa, go, prots).collect()
    }
    assert rows == {
        ("1abc", "A", "9606", "IPR1", "GO:1", "P1"),
        ("1abc", "B", "10090", "IPR1", "GO:1", ""),
    }
    out = str(tmp_path / "pdb2go")
    write_tsv(
        pdb2interpro2go(matches, taxa, go, prots).orderBy("pdb_id", "chain"),
        out,
        header_lines=[PDB2GO_HEADER],
        include_header=False,
    )
    lines = _read_single(out)
    assert lines[0] == "#PDBe ID\tchain\tTaxon ID\tInterPro accession\tGO ID\tUniProt accession"
    assert "1abc\tB\t10090\tIPR1\tGO:1\t" in lines


def test_pthr2go2uniprot(spark, tmp_path):
    panther_go = spark.createDataFrame(
        [
            ("PTHR1", "AN1", "PTN001", "GO:1"),
            ("PTHR1", "AN1", "PTN001", "GO:2"),
            ("PTHR2", "AN9", "PTN009", "GO:3"),
        ],
        "family_acc string, an_id string, ptn_id string, go_id string",
    )
    matches = spark.createDataFrame(
        [
            ("P1", "PTHR1", "AN1"),
            ("P2", "PTHR1", "AN2"),  # node without GO -> dropped
            ("P3", "PTHR2", "AN9"),
        ],
        "protein_acc string, family_acc string, an_id string",
    )
    sigs = spark.createDataFrame(
        [("PTHR1", "IPR9"), ("PTHR2", None)],
        "signature_acc string, entry_acc string",
    )
    rows = {tuple(r) for r in pthr2go2uniprot(panther_go, matches, sigs).collect()}
    assert rows == {
        ("PTHR1", "PTN001", "IPR9", "GO:1", "P1"),
        ("PTHR1", "PTN001", "IPR9", "GO:2", "P1"),
        ("PTHR2", "PTN009", "-", "GO:3", "P3"),
    }
    out = str(tmp_path / "pthr2go")
    write_tsv(
        pthr2go2uniprot(panther_go, matches, sigs).orderBy("family_acc", "go_id"),
        out,
        header_lines=[PTHR2GO_HEADER],
        include_header=False,
    )
    lines = _read_single(out)
    assert lines[0].startswith("# PANTHER family accession\t")
    assert lines[1] == "PTHR1\tPTN001\tIPR9\tGO:1\tP1"
