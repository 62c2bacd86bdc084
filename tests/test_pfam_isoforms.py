"""Golden tests for the isoform export composition (reference
interpro/oracle/matches.py:585-640) and the Pfam family/alignment
exports (interpro/oracle/pfam.py:13-67,140-166)."""

from __future__ import annotations

import json

from interpro7_dw_spark.domain.isoforms import (
    attach_isoform_matches,
    isoform_master,
    merge_isoform_matches,
)
from interpro7_dw_spark.domain.pfam import pfam_alignments, pfam_families


def _iso_fixture(spark):
    variants = spark.createDataFrame(
        [
            ("P1", 1, 150, "CRC1"),   # sequence via seq_long (short null)
            ("P1", 2, 148, "CRC2"),   # sequence via seq_short
            ("P2", 1, 99, "CRCX"),    # no uniparc row -> master dropped
        ],
        "protein_acc string, variant int, length int, crc64 string",
    )
    uniparc = spark.createDataFrame(
        [
            ("CRC1", None, "MKLLSEQLONG"),
            ("CRC2", "MKSHORT", "MKLONGER"),
        ],
        "crc64 string, seq_short string, seq_long string",
    )
    matches = spark.createDataFrame(
        [
            ("P1-1", "PF00001", None, 1, 120, None, 10.0),
            ("P1-1", "PF00002", None, 200, 300, None, 3.0),
            # orphan: master P2-1 was dropped by the crc64 inner join
            ("P2-1", "PF00001", None, 5, 50, None, 1.0),
            # orphan: variant 9 never existed
            ("P1-9", "PF00001", None, 5, 50, None, 1.0),
        ],
        "accession string, signature_acc string, model_acc string, "
        "pos_from long, pos_to long, fragments string, score double",
    )
    signatures = spark.createDataFrame(
        [
            ("PF00001", "Kinase dom", "kin_dom", "Pfam", "domain", "hmm", "IPR000001"),
            ("PF00002", "Kinase C", "kin_c", "Pfam", "domain", "hmm", "IPR000001"),
        ],
        "signature_acc string, name string, short_name string, database string, "
        "type string, evidence string, entry_acc string",
    )
    entries = spark.createDataFrame(
        [("IPR000001", "Kinase", "kinase", "Domain", None)],
        "entry_acc string, name string, short_name string, type string, parent_acc string",
    )
    return variants, uniparc, matches, signatures, entries


def test_isoform_master_join_and_coalesce(spark):
    variants, uniparc, *_ = _iso_fixture(spark)
    rows = {r["accession"]: r for r in isoform_master(variants, uniparc).collect()}
    # P2-1 dropped by the crc64 inner join (reference matches.py:593-600)
    assert set(rows) == {"P1-1", "P1-2"}
    assert rows["P1-1"]["sequence"] == "MKLLSEQLONG"   # seq_short null
    assert rows["P1-2"]["sequence"] == "MKSHORT"       # seq_short wins
    assert rows["P1-1"]["protein"] == "P1"
    assert rows["P1-1"]["length"] == 150


def test_attach_drops_orphan_matches(spark):
    variants, uniparc, matches, *_ = _iso_fixture(spark)
    master = isoform_master(variants, uniparc)
    kept = attach_isoform_matches(master, matches).collect()
    # the reference's `except KeyError: continue` (matches.py:624-628)
    assert {r["accession"] for r in kept} == {"P1-1"}
    assert len(kept) == 2


def test_merge_isoform_matches_end_to_end(spark):
    out = merge_isoform_matches(*_iso_fixture(spark)).collect()
    by_key = {(r["accession"], r["match_acc"]): r for r in out}
    # P1-1: two signature rows + one condensed entry row
    assert set(by_key) == {
        ("P1-1", "PF00001"),
        ("P1-1", "PF00002"),
        ("P1-2", None),  # master kept with no matches (left join)
        ("P1-1", "IPR000001"),
    }
    entry = by_key[("P1-1", "IPR000001")]
    locs = json.loads(entry["locations"])
    # [1,120] and [200,300] don't condense into one span
    spans = [(l["fragments"][0]["start"], l["fragments"][0]["end"]) for l in locs]
    assert spans == [(1, 120), (200, 300)]
    # master columns survive on every row
    assert by_key[("P1-2", None)]["sequence"] == "MKSHORT"


def test_pfam_families_json_golden(spark):
    pfam_a = spark.createDataFrame(
        [
            (
                "PF00042",
                "SO:0100021",
                '["A. Person","B. Other"]',
                "hmmbuild HMM.ann SEED.ann",
                "hmmsearch -Z 45638612 -E 1000",
                25.0,
                24.5,
                "1.12",
            )
        ],
        "accession string, seq_ontology_id string, authors string, "
        "build_cmd string, search_cmd string, seq_ga double, dom_ga double, "
        "version string",
    )
    [row] = pfam_families(pfam_a).collect()
    # exact nested dict shape of reference pfam.py:27-48 (minus the
    # driver-side wikipedia fetch), nulls kept
    assert json.loads(row["details_json"]) == {
        "curation": {
            "sequence_ontology": "SO:0100021",
            "authors": ["A. Person", "B. Other"],
        },
        "hmm": {
            "commands": {
                "build": "hmmbuild HMM.ann SEED.ann",
                "search": "hmmsearch -Z 45638612 -E 1000",
            },
            "cutoffs": {"gathering": {"sequence": 25.0, "domain": 24.5}},
            "version": "1.12",
        },
    }


def test_pfam_alignments_unpivot(spark):
    pfam_a = spark.createDataFrame(
        [("PF00042", b"\x1f\x8bSEED", 12, b"\x1f\x8bFULL", 3456)],
        "accession string, seed_aln binary, seed_num int, "
        "full_aln binary, full_num int",
    )
    rows = {r["aln_type"]: r for r in pfam_alignments(pfam_a).collect()}
    assert set(rows) == {"alignment:seed", "alignment:full"}
    assert bytes(rows["alignment:seed"]["alignment"]) == b"\x1f\x8bSEED"
    assert rows["alignment:seed"]["n_sequences"] == 12
    assert bytes(rows["alignment:full"]["alignment"]) == b"\x1f\x8bFULL"
    assert rows["alignment:full"]["n_sequences"] == 3456
